"""Window attention kernel v4 — the GEMMs fold in.

v3 (window_attention_v3.py) fuses QKᵀ+bias+mask+softmax+V but leaves
the qkv projection and the output projection to XLA, so the packed
(B_, N, 3C) qkv tensor and the (B_, N, C) attention output make a full
HBM round trip in each direction (fwd and bwd). v4 takes the raw
window tokens x and BOTH weight matrices and computes

    out = proj( window_attention( x @ Wqkv + bqkv ) ) + bproj

entirely in VMEM per window block. The weights live in VMEM across the
whole (sequential) grid — their block index is constant, so Pallas
DMAs them once. The backward recomputes qkv and the softmax
(flash-style) and accumulates dWqkv/dbqkv/dWproj/dbproj/dbias across
grid steps into constant-index output blocks.

Reference behaviour: swin_transformer.py:73-153 (WindowAttention
forward = qkv Linear → attention → proj Linear).

Opt-in via SWINDET_WATTN_V4=1 (models/backbones/swin.py) until the
fold is profiled on hardware against v3.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_attention import window_attention_reference


def _pick_wblk(n_windows: int, num_heads: int, cap_product: int
               ) -> int:
    cap = max(1, cap_product // num_heads)
    for w in range(min(cap, n_windows), 0, -1):
        if n_windows % w == 0:
            return w
    return 1


# Mosaic cannot reshape (W, N, C) <-> (W*N, C) when N is sublane-
# unaligned (N=49), so every matmul stays 3-D: projections are
# rank3×rank2 dot_generals (verified supported on Mosaic), weight-grad
# contractions unroll over the ≤wblk windows as 2-D transpose-matmuls.
def _x_proj(x3, w2, dim=0):
    """(W, N, A) @ (A, B) → (W, N, B) without flattening windows."""
    return jax.lax.dot_general(
        x3, w2, dimension_numbers=(((2,), (dim,)), ((), ())),
        preferred_element_type=jnp.float32)


def _acc_weight_grad(a3, b3):
    """Σ_w a3[w]ᵀ · b3[w] — (W, N, A), (W, N, B) → (A, B)."""
    acc = jax.lax.dot_general(
        a3[0], b3[0], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    for w in range(1, a3.shape[0]):
        acc = acc + jax.lax.dot_general(
            a3[w], b3[w], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc


def _sum_rows(x3):
    """(W, N, C) → (1, C) sum over windows and tokens."""
    return jnp.sum(jnp.sum(x3, axis=0), axis=0, keepdims=True)


# ------------------------------------------------------------------ fwd
def _wattn4_kernel(x_ref, wqkv_ref, bqkv_ref, bias_ref, mask_ref,
                   wproj_ref, bproj_ref, out_ref, *, nh: int,
                   scale: float):
    wblk, n, c = x_ref.shape
    hd = c // nh
    x32 = x_ref[:].astype(jnp.float32)                  # (wblk, N, C)
    qkv = _x_proj(x32, wqkv_ref[:].astype(jnp.float32))
    qkv = qkv + bqkv_ref[:].astype(jnp.float32)[None]   # (wblk, N, 3C)
    mask = mask_ref[:]
    heads = []
    for h in range(nh):
        q = qkv[:, :, h * hd:(h + 1) * hd] * scale
        k = qkv[:, :, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        attn = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        attn = attn + bias_ref[h][None] + mask
        attn = jax.nn.softmax(attn, axis=-1)
        heads.append(jax.lax.dot_general(
            attn, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    attn_out = jnp.concatenate(heads, axis=-1)         # (wblk, N, C)
    out = _x_proj(attn_out, wproj_ref[:].astype(jnp.float32))
    out = out + bproj_ref[:].astype(jnp.float32)[None]
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('num_heads', 'interpret'))
def _wattn4_fwd_impl(x, wqkv, bqkv, bias, mask, wproj, bproj,
                     num_heads, interpret):
    b_, n, c = x.shape
    nh = num_heads
    scale = (c // nh) ** -0.5
    nw = mask.shape[0]
    wblk = _pick_wblk(nw if nw > 1 else b_, nh, cap_product=32)
    if b_ % wblk:
        wblk = 1
    nmb = nw // wblk if nw > 1 else 1
    grid = (b_ // wblk,)
    blk = lambda i: (i, 0, 0)
    const2 = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)
    kernel = functools.partial(_wattn4_kernel, nh=nh, scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_, n, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((wblk, n, c), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, n, n), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((wblk, n, n), lambda i: (i % nmb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wblk, n, c), blk,
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, wqkv, bqkv.reshape(1, -1), bias,
      mask if nw > 1 else jnp.broadcast_to(mask, (wblk, n, n)),
      wproj, bproj.reshape(1, -1))


# ------------------------------------------------------------------ bwd
def _wattn4_bwd_kernel(x_ref, wqkv_ref, bqkv_ref, bias_ref, mask_ref,
                       wproj_ref, g_ref,
                       dx_ref, dwqkv_ref, dbqkv_ref, dbias_ref,
                       dwproj_ref, dbproj_ref, *, nh: int,
                       scale: float):
    i = pl.program_id(0)
    wblk, n, c = x_ref.shape
    hd = c // nh

    @pl.when(i == 0)
    def _init():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dwproj_ref[:] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[:] = jnp.zeros_like(dbproj_ref)

    # ---- recompute forward intermediates
    x32 = x_ref[:].astype(jnp.float32)                 # (wblk, N, C)
    wqkv = wqkv_ref[:].astype(jnp.float32)
    qkv = _x_proj(x32, wqkv)
    qkv = qkv + bqkv_ref[:].astype(jnp.float32)[None]  # (wblk, N, 3C)
    mask = mask_ref[:]
    g = g_ref[:].astype(jnp.float32)                   # (wblk, N, C)
    wproj = wproj_ref[:].astype(jnp.float32)

    # ---- proj backward
    heads, probs = [], []
    for h in range(nh):
        q = qkv[:, :, h * hd:(h + 1) * hd] * scale
        k = qkv[:, :, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s + bias_ref[h][None] + mask
        p = jax.nn.softmax(s, axis=-1)
        probs.append(p)
        heads.append(jax.lax.dot_general(
            p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    attn_out = jnp.concatenate(heads, axis=-1)         # (wblk, N, C)

    dwproj_ref[:] += _acc_weight_grad(attn_out, g)     # (C, C)
    dbproj_ref[:] += _sum_rows(g)
    d_attn = _x_proj(g, wproj, dim=1)                  # (wblk, N, C)

    # ---- attention backward per head (flash recompute)
    dqkv_parts = [None] * (3 * nh)
    for h in range(nh):
        q = qkv[:, :, h * hd:(h + 1) * hd] * scale
        k = qkv[:, :, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        p = probs[h]
        gh = d_attn[:, :, h * hd:(h + 1) * hd]
        dv = jax.lax.dot_general(
            p, gh, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            gh, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(
            ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dbias_ref[h] += jnp.sum(ds, axis=0)
        dqkv_parts[h] = dq
        dqkv_parts[nh + h] = dk
        dqkv_parts[2 * nh + h] = dv
    dqkv = jnp.concatenate(dqkv_parts, axis=-1)        # (wblk, N, 3C)

    # ---- qkv-projection backward
    dwqkv_ref[:] += _acc_weight_grad(x32, dqkv)        # (C, 3C)
    dbqkv_ref[:] += _sum_rows(dqkv)
    dx = _x_proj(dqkv, wqkv, dim=1)                    # (wblk, N, C)
    dx_ref[:] = dx.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=('num_heads', 'interpret'))
def _wattn4_bwd_impl(x, wqkv, bqkv, bias, mask, wproj, g,
                     num_heads, interpret):
    b_, n, c = x.shape
    nh = num_heads
    scale = (c // nh) ** -0.5
    nw = mask.shape[0]
    wblk = _pick_wblk(nw if nw > 1 else b_, nh, cap_product=16)
    if b_ % wblk:
        wblk = 1
    nmb = nw // wblk if nw > 1 else 1
    grid = (b_ // wblk,)
    blk = lambda i: (i, 0, 0)
    const2 = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)
    kernel = functools.partial(_wattn4_bwd_kernel, nh=nh, scale=scale)
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b_, n, c), x.dtype),          # dx
            jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),      # dwqkv
            jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),      # dbqkv
            jax.ShapeDtypeStruct((nh, n, n), jnp.float32),      # dbias
            jax.ShapeDtypeStruct((c, c), jnp.float32),          # dwproj
            jax.ShapeDtypeStruct((1, c), jnp.float32),          # dbproj
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((wblk, n, c), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, n, n), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((wblk, n, n), lambda i: (i % nmb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((wblk, n, c), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((wblk, n, c), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, n, n), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, wqkv, bqkv.reshape(1, -1), bias,
      mask if nw > 1 else jnp.broadcast_to(mask, (wblk, n, n)),
      wproj, g)
    return outs


# ------------------------------------------------------------ public op
def window_attention_v4(x: jnp.ndarray, wqkv: jnp.ndarray,
                        bqkv: jnp.ndarray, bias: jnp.ndarray,
                        mask: Optional[jnp.ndarray],
                        wproj: jnp.ndarray, bproj: jnp.ndarray,
                        num_heads: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Differentiable fully-fused window attention.

    x:     (B_, N, C) window tokens; B_ = batch * nW
    wqkv:  (C, 3C), bqkv (3C,)  — flax Dense('qkv') layout
    bias:  (nH, N, N) fp32 relative-position bias
    mask:  (nW, N, N) fp32 additive shift mask or None (nW | B_)
    wproj: (C, C),  bproj (C,)  — flax Dense('proj') layout
    """
    n = x.shape[1]
    if mask is None:
        mask = jnp.zeros((1, n, n), jnp.float32)
    return _wattn4_vjp(x, wqkv, bqkv, bias,
                       jnp.asarray(mask, jnp.float32), wproj, bproj,
                       num_heads, interpret)


def window_attention_v4_reference(x, wqkv, bqkv, bias, mask, wproj,
                                  bproj, num_heads):
    """Unfused composition (oracle for tests and the non-TPU path)."""
    qkv = x @ wqkv.astype(x.dtype) + bqkv.astype(x.dtype)
    out = window_attention_reference(qkv, bias, mask, num_heads)
    return out @ wproj.astype(out.dtype) + bproj.astype(out.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _wattn4_vjp(x, wqkv, bqkv, bias, mask, wproj, bproj, num_heads,
                interpret):
    return _wattn4_fwd_impl(x, wqkv, bqkv, bias, mask, wproj, bproj,
                            num_heads, interpret)


def _wattn4_vjp_fwd(x, wqkv, bqkv, bias, mask, wproj, bproj,
                    num_heads, interpret):
    out = _wattn4_fwd_impl(x, wqkv, bqkv, bias, mask, wproj, bproj,
                           num_heads, interpret)
    return out, (x, wqkv, bqkv, bias, mask, wproj, bproj)


def _wattn4_vjp_bwd(num_heads, interpret, res, g):
    x, wqkv, bqkv, bias, mask, wproj, bproj = res
    use_pallas = interpret or jax.default_backend() == 'tpu'
    if use_pallas:
        dx, dwqkv, dbqkv, dbias, dwproj, dbproj = _wattn4_bwd_impl(
            x, wqkv, bqkv, bias, mask, wproj, g, num_heads, interpret)
        # the shift mask is a trace-time constant — no cotangent
        return (dx, dwqkv.astype(wqkv.dtype),
                dbqkv.reshape(-1).astype(bqkv.dtype),
                dbias.astype(bias.dtype), jnp.zeros_like(mask),
                dwproj.astype(wproj.dtype),
                dbproj.reshape(-1).astype(bproj.dtype))
    _, vjp = jax.vjp(
        lambda *a: window_attention_v4_reference(*a, num_heads),
        x, wqkv, bqkv, bias, mask, wproj, bproj)
    return vjp(g)


_wattn4_vjp.defvjp(_wattn4_vjp_fwd, _wattn4_vjp_bwd)
