"""Fused shifted-window attention core — Pallas TPU kernel.

The Swin hot loop (reference: mmdet/models/backbones/swin_transformer.py
:73-153 WindowAttention) computes, per (window, head):
    attn = softmax(q k^T * scale + rel_pos_bias [+ shift_mask]) v
XLA runs this as several fused HLOs with HBM round-trips between the
(B*nW, nH, N, N) logits and the value matmul; this kernel keeps the
whole chain in VMEM per window-block, with fp32 logits/softmax and bf16
matmul inputs (MXU) — the SURVEY.md §5.7 north-star fusion.

Layout: N = ws*ws tokens padded to N_PAD (sublane multiple); head_dim on
lanes. Window-blocks of WBLK windows ride the grid.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, d: int) -> int:
    return (v + d - 1) // d * d


def _wattn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *,
                  scale: float, n_tok: int):
    """One grid step: (WBLK, nH, N_PAD, HD) q/k/v block + (nH, N_PAD,
    N_PAD) bias + (WBLK, N_PAD, N_PAD) mask → (WBLK, nH, N_PAD, HD)."""
    w, h, npad, d = q_ref.shape
    q = q_ref[:].astype(jnp.float32) * scale
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:]
    # Mosaic matmul supports ONE batch dim — fold (W, nH) together
    qf = q.reshape(w * h, npad, d)
    kf = k.reshape(w * h, npad, d)
    attn = jax.lax.dot_general(
        qf, kf,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (W*H, N, N)
    attn = attn.reshape(w, h, npad, npad)
    attn += bias_ref[:][None]           # (1, nH, N, N)
    attn += mask_ref[:][:, None]        # (WBLK, 1, N, N)
    # mask out padded key tokens before softmax
    col = jax.lax.broadcasted_iota(jnp.int32, attn.shape, 3)
    attn = jnp.where(col < n_tok, attn, -1e30)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        attn.reshape(w * h, npad, npad).astype(v.dtype),
        v.reshape(w * h, npad, d),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[:] = out.reshape(w, h, npad, d).astype(out_ref.dtype)


def window_attention(qkv: jnp.ndarray,
                     bias: jnp.ndarray,
                     mask: Optional[jnp.ndarray] = None,
                     *, num_heads: int,
                     wblk: int = 16,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused window attention (differentiable: Pallas forward, lax-spec
    recompute backward — remat-style, SURVEY.md §5.7).

    qkv:  (B_, N, 3C) packed projections (B_ = batch*num_windows)
    bias: (nH, N, N) relative position bias (fp32)
    mask: (nW, N, N) additive shift mask or None; B_ % nW == 0
    Returns (B_, N, C).
    """
    n = qkv.shape[1]
    if mask is None:
        mask = jnp.zeros((1, n, n), jnp.float32)
    return _window_attention_vjp(qkv, bias, mask, num_heads, wblk,
                                 interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _window_attention_vjp(qkv, bias, mask, num_heads, wblk, interpret):
    return _window_attention_fwd_impl(qkv, bias, mask, num_heads, wblk,
                                      interpret)


def _wattn_vjp_fwd(qkv, bias, mask, num_heads, wblk, interpret):
    out = _window_attention_fwd_impl(qkv, bias, mask, num_heads, wblk,
                                     interpret)
    return out, (qkv, bias, mask)


def _wattn_vjp_bwd(num_heads, wblk, interpret, res, g):
    qkv, bias, mask = res
    _, vjp = jax.vjp(
        lambda a, b, m: window_attention_reference(a, b, m, num_heads),
        qkv, bias, mask)
    return vjp(g)


_window_attention_vjp.defvjp(_wattn_vjp_fwd, _wattn_vjp_bwd)


@functools.partial(jax.jit, static_argnames=('num_heads', 'wblk',
                                             'interpret'))
def _window_attention_fwd_impl(qkv: jnp.ndarray,
                               bias: jnp.ndarray,
                               mask: jnp.ndarray,
                               num_heads: int,
                               wblk: int = 16,
                               interpret: bool = False) -> jnp.ndarray:
    b_, n, c3 = qkv.shape
    c = c3 // 3
    nh = num_heads
    hd = c // nh
    scale = hd ** -0.5

    # keep (wblk × nh) roughly constant so VMEM block size stays ~fixed
    wblk = max(1, min(wblk, 48 // nh))
    n_pad = _round_up(n, 8)
    b_pad = _round_up(b_, wblk)

    qkv_r = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv_r[0], qkv_r[1], qkv_r[2]          # (B_, nH, N, hd)

    def pad(x):
        return jnp.pad(x, ((0, b_pad - b_), (0, 0), (0, n_pad - n),
                           (0, 0)))

    q, k, v = pad(q), pad(k), pad(v)
    bias_p = jnp.pad(bias, ((0, 0), (0, n_pad - n), (0, n_pad - n)))

    nw = mask.shape[0]
    reps = b_ // nw
    mask_p = jnp.pad(mask, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
    mask_full = jnp.tile(mask_p, (reps, 1, 1))
    mask_full = jnp.pad(mask_full, ((0, b_pad - b_), (0, 0), (0, 0)))

    grid = (b_pad // wblk,)
    blk = lambda i: (i, 0, 0, 0)
    out = pl.pallas_call(
        functools.partial(_wattn_kernel, scale=scale, n_tok=n),
        out_shape=jax.ShapeDtypeStruct((b_pad, nh, n_pad, hd),
                                       qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((wblk, nh, n_pad, hd), blk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wblk, nh, n_pad, hd), blk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wblk, nh, n_pad, hd), blk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, n_pad, n_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wblk, n_pad, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wblk, nh, n_pad, hd), blk,
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, bias_p, mask_full)

    out = out[:b_, :, :n, :]                       # unpad
    return out.transpose(0, 2, 1, 3).reshape(b_, n, c)


def window_attention_reference(qkv: jnp.ndarray, bias: jnp.ndarray,
                               mask: Optional[jnp.ndarray],
                               num_heads: int) -> jnp.ndarray:
    """Pure-lax spec (identical math; used for parity tests and as the
    non-TPU fallback)."""
    b_, n, c3 = qkv.shape
    c = c3 // 3
    nh = num_heads
    hd = c // nh
    scale = hd ** -0.5
    qkv_r = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv_r[0], qkv_r[1], qkv_r[2]
    attn = jnp.einsum('bhnd,bhmd->bhnm', q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b_ // nw, nw, nh, n, n)
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(b_, nh, n, n)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
    out = jnp.einsum('bhnm,bhmd->bhnd', attn.astype(v.dtype), v)
    return out.transpose(0, 2, 1, 3).reshape(b_, n, c)
