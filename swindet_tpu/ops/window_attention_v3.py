"""Window attention kernel v3 — zero host-side layout work.

v1 (window_attention.py) needed XLA-side head-split transposes and
batch/N padding around the kernel; profiling showed those pads/copies
cost more than the attention itself. v3 moves ALL layout into the
kernel: inputs are the raw (B_, N, C) q/k/v lane-slices of the packed
qkv projection; heads are peeled with static lane slices inside the
kernel (Mosaic supports lane slicing, not lane reshapes), and the
window block size is chosen as a divisor of the per-image window count
so no batch padding is needed.

Reference behaviour: swin_transformer.py:73-153 (WindowAttention).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_attention import window_attention_reference


def _pick_wblk(n_windows: int, num_heads: int, cap_product: int = 48
               ) -> int:
    """Largest divisor of n_windows with wblk*num_heads <= cap (VMEM)."""
    cap = max(1, cap_product // num_heads)
    for w in range(min(cap, n_windows), 0, -1):
        if n_windows % w == 0:
            return w
    return 1


def _wattn3_kernel(qkv_ref, bias_ref, mask_ref, out_ref, *,
                   nh: int, scale: float):
    """One block of windows; q/k/v and heads peeled by static lane
    slices INSIDE the kernel (XLA-side slices materialize copies)."""
    wblk, n, c3 = qkv_ref.shape
    c = c3 // 3
    hd = c // nh
    mask = mask_ref[:]                       # (wblk, N, N) fp32
    for h in range(nh):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd].astype(jnp.float32) * scale
        k = qkv_ref[:, :, c + h * hd:c + (h + 1) * hd].astype(jnp.float32)
        v = qkv_ref[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        attn = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (wblk, N, N)
        attn = attn + bias_ref[h][None] + mask
        attn = jax.nn.softmax(attn, axis=-1)
        out = jax.lax.dot_general(
            attn.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:, :, h * hd:(h + 1) * hd] = out.astype(out_ref.dtype)


def window_attention_v3(qkv: jnp.ndarray, bias: jnp.ndarray,
                        mask: Optional[jnp.ndarray], num_heads: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Differentiable fused window attention, zero-copy wrapper.

    qkv:  (B_, N, 3C); B_ = batch * nW (window-major within image)
    bias: (nH, N, N) fp32
    mask: (nW, N, N) fp32 additive or None; nW must divide B_
    """
    n = qkv.shape[1]
    if mask is None:
        mask = jnp.zeros((1, n, n), jnp.float32)
    return _wattn3_vjp(qkv, bias, jnp.asarray(mask, jnp.float32),
                       num_heads, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _wattn3_vjp(qkv, bias, mask, num_heads, interpret):
    return _wattn3_fwd_impl(qkv, bias, mask, num_heads, interpret)


def _wattn3_vjp_fwd(qkv, bias, mask, num_heads, interpret):
    use_pallas = interpret or jax.default_backend() == 'tpu'
    if use_pallas:
        # Save the fp32 softmax probabilities as a residual: the bwd
        # kernel then skips the s-recompute + softmax entirely (the
        # dominant VPU cost at N=49 — lanes pad 49→128, so every
        # softmax pass wastes 2.6x). P is bit-identical to what the
        # old bwd recomputed, so grads are unchanged. Without remat
        # this trades ~400 MB of HBM traffic for ~half the bwd VPU
        # work; under nn.remat the residual is transient (recomputed
        # at bwd time) either way.
        out, p = _wattn3_fwd_p_impl(qkv, bias, mask, num_heads,
                                    interpret)
        return out, (qkv, p, mask)
    return _wattn3_fwd_impl(qkv, bias, mask, num_heads, interpret), \
        (qkv, bias, mask)


def _wattn3_vjp_bwd(num_heads, interpret, res, g):
    use_pallas = interpret or jax.default_backend() == 'tpu'
    if use_pallas:
        qkv, p, mask = res
        dqkv, dbias = _wattn3_bwd_impl(qkv, p, g, num_heads, interpret)
        # the shift mask is a trace-time constant — no cotangent flows
        # into it in any training graph
        return dqkv, dbias, jnp.zeros_like(mask)
    qkv, bias, mask = res
    _, vjp = jax.vjp(
        lambda a, b, m: window_attention_reference(a, b, m, num_heads),
        qkv, bias, mask)
    return vjp(g)


_wattn3_vjp.defvjp(_wattn3_vjp_fwd, _wattn3_vjp_bwd)


def _wattn3_bwd_kernel(qkv_ref, p_ref, g_ref,
                       dqkv_ref, dbias_ref, *, nh: int, scale: float):
    """Backward of the fused window attention for one window block.

    Consumes the fp32 softmax probabilities saved by the forward (no
    s-recompute, no exp — at N=49 the softmax passes ran on 49→128
    lane-padded tiles and dominated the kernel), then
      dV = P^T g, dP = g V^T, dS = P*(dP - rowsum(dP*P)),
      dQ = scale * dS K, dK = dS^T (scale*Q), dBias_h += sum_w dS.
    dBias accumulates across the sequential grid into a single block.
    """
    i = pl.program_id(0)
    wblk, n, c3 = qkv_ref.shape
    c = c3 // 3
    hd = c // nh

    @pl.when(i == 0)
    def _init():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    for h in range(nh):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd].astype(jnp.float32) * scale
        k = qkv_ref[:, :, c + h * hd:c + (h + 1) * hd].astype(jnp.float32)
        v = qkv_ref[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd] \
            .astype(jnp.float32)
        gh = g_ref[:, :, h * hd:(h + 1) * hd].astype(jnp.float32)
        p = p_ref[h]                                  # (wblk, N, N) fp32

        # dV = P^T g  (per window)
        dv = jax.lax.dot_general(
            p, gh, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (wblk, N, hd)
        # dP = g V^T
        dp = jax.lax.dot_general(
            gh, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (wblk, N, N)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        # dQ_raw = scale * (dS K)
        dq = jax.lax.dot_general(
            ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        # dK = dS^T Q_scaled
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        dqkv_ref[:, :, h * hd:(h + 1) * hd] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, c + h * hd:c + (h + 1) * hd] = \
            dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd] = \
            dv.astype(dqkv_ref.dtype)
        dbias_ref[h] += jnp.sum(ds, axis=0)


@functools.partial(jax.jit, static_argnames=('num_heads', 'interpret'))
def _wattn3_bwd_impl(qkv, p, g, num_heads, interpret):
    b_, n, c3 = qkv.shape
    c = c3 // 3
    nh = num_heads
    hd = c // nh
    scale = hd ** -0.5

    # backward holds ~2x the forward live set per block — halve the cap
    wblk = _pick_wblk(b_, nh, cap_product=24)
    if b_ % wblk:
        wblk = 1

    grid = (b_ // wblk,)
    blk = lambda i: (i, 0, 0)
    kernel = functools.partial(_wattn3_bwd_kernel, nh=nh, scale=scale)
    dqkv, dbias = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b_, n, c3), qkv.dtype),
                   jax.ShapeDtypeStruct((nh, n, n), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((wblk, n, c3), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, wblk, n, n), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wblk, n, c), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((wblk, n, c3), blk,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((nh, n, n), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(qkv, p, g)
    return dqkv, dbias


def _wattn3_kernel_p(qkv_ref, bias_ref, mask_ref, out_ref, p_ref, *,
                     nh: int, scale: float):
    """Forward that additionally writes the fp32 softmax probabilities
    (residual for the backward kernel). Same math as _wattn3_kernel."""
    wblk, n, c3 = qkv_ref.shape
    c = c3 // 3
    hd = c // nh
    mask = mask_ref[:]
    for h in range(nh):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd].astype(jnp.float32) * scale
        k = qkv_ref[:, :, c + h * hd:c + (h + 1) * hd].astype(jnp.float32)
        v = qkv_ref[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        attn = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        attn = attn + bias_ref[h][None] + mask
        attn = jax.nn.softmax(attn, axis=-1)
        p_ref[h] = attn
        out = jax.lax.dot_general(
            attn.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:, :, h * hd:(h + 1) * hd] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('num_heads', 'interpret'))
def _wattn3_fwd_p_impl(qkv, bias, mask, num_heads, interpret):
    """Forward returning (out, p) with p laid out (nh, B_, N, N) fp32 so
    the backward can block it per window-block."""
    b_, n, c3 = qkv.shape
    c = c3 // 3
    nh = num_heads
    hd = c // nh
    scale = hd ** -0.5
    nw = mask.shape[0]

    wblk = _pick_wblk(nw if nw > 1 else b_, nh, cap_product=24)
    if b_ % wblk:
        wblk = 1
    nmb = nw // wblk if nw > 1 else 1

    grid = (b_ // wblk,)
    blk = lambda i: (i, 0, 0)
    kernel = functools.partial(_wattn3_kernel_p, nh=nh, scale=scale)
    out, p = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b_, n, c), qkv.dtype),
                   jax.ShapeDtypeStruct((nh, b_, n, n), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((wblk, n, c3), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wblk, n, n),
                         lambda i: (i % nmb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((wblk, n, c), blk,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((nh, wblk, n, n), lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(qkv, bias, mask if nw > 1 else jnp.broadcast_to(
        mask, (wblk, n, n)))
    return out, p


@functools.partial(jax.jit, static_argnames=('num_heads', 'interpret'))
def _wattn3_fwd_impl(qkv, bias, mask, num_heads, interpret):
    b_, n, c3 = qkv.shape
    c = c3 // 3
    nh = num_heads
    hd = c // nh
    scale = hd ** -0.5
    nw = mask.shape[0]

    wblk = _pick_wblk(nw if nw > 1 else b_, nh)
    if b_ % wblk:
        wblk = 1
    nmb = nw // wblk if nw > 1 else 1

    grid = (b_ // wblk,)
    blk = lambda i: (i, 0, 0)
    kernel = functools.partial(_wattn3_kernel, nh=nh, scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_, n, c), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((wblk, n, c3), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wblk, n, n),
                         lambda i: (i % nmb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wblk, n, c), blk,
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkv, bias, mask if nw > 1 else jnp.broadcast_to(
        mask, (wblk, n, n)))
    return out
