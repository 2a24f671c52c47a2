"""Fully-fused shifted-window attention over the feature map — Pallas.

v2 of the SW-MSA fusion (SURVEY.md §5.7 north star). Key insight: the
qkv projection is pointwise per token, so it commutes with the cyclic
shift and window partition — run it as ONE large MXU GEMM on the padded
(B, Hp, Wp, 3C) map, then this kernel performs
    roll → window partition → (QKᵀ·scale + rel-bias + shift-mask
    → softmax → ·V) → window reverse
in a single HBM pass, writing the attention output in *rolled*
coordinates (the caller un-rolls with one jnp.roll). This removes the
per-block roll/partition/reverse copies and pad ops that dominate the
XLA schedule (profiled: copies 3.9 ms + pads 1.6 ms + slices 1.5 ms per
backbone pass at 800×1344 before this kernel).

The shift mask is not an input: region ids (the reference's img_mask
slices, swin_transformer.py:370-389) are recomputed from iota inside
the kernel.

Reference behaviour: mmdet/models/backbones/swin_transformer.py:156-250.
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


def _region_ids(n_pix: int, ws: int, shift: int, rolled_off: int
                ) -> 'jnp.ndarray':
    """Region id per ROLLED pixel index r — exactly the reference's
    img_mask slices (swin_transformer.py:374-380), which are expressed
    in rolled coordinates: 0 for r < P-ws, 1 for P-ws <= r < P-shift,
    2 for r >= P-shift."""
    r = jax.lax.broadcasted_iota(jnp.int32, (ws, 1), 0)[:, 0] + rolled_off
    return jnp.where(r < n_pix - ws, 0,
                     jnp.where(r < n_pix - shift, 1, 2))


def _swin_attn_kernel(cur_ref, nxt_ref, bias_ref, out_ref, *,
                      ws: int, shift: int, nh: int, hp: int, wp: int,
                      scale: float):
    """One grid step = one window-row of one image.

    cur/nxt: (1, ws, Wp, 3C) ws-aligned row blocks i and (i+1) % nHb.
    out: (1, ws, Wp, C) attention output in rolled coordinates.
    """
    i = pl.program_id(1)
    n = ws * ws
    wp_blk = cur_ref.shape[2]
    c3 = cur_ref.shape[3]
    c = c3 // 3
    hd = c // nh
    nww = wp // ws

    cur = cur_ref[0]
    if shift:
        nxt = nxt_ref[0]
        rows = jnp.concatenate([cur[shift:], nxt[:shift]], axis=0)
        rows = jnp.concatenate([rows[:, shift:], rows[:, :shift]],
                               axis=1)
    else:
        rows = cur

    # partition: (ws, Wp, 3C) → (nWw, N, 3C). Only leading/sublane dims
    # are reshaped; the lane (channel) dim is split via static slices —
    # Mosaic does not support lane-dim reshapes.
    win = rows.reshape(ws, nww, ws, c3).transpose(1, 0, 2, 3)
    win = win.reshape(nww, n, c3)
    q = jnp.stack([win[:, :, h * hd:(h + 1) * hd]
                   for h in range(nh)], axis=0)          # (nH,nWw,N,hd)
    k = jnp.stack([win[:, :, c + h * hd:c + (h + 1) * hd]
                   for h in range(nh)], axis=0)
    v = jnp.stack([win[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
                   for h in range(nh)], axis=0)
    q = q.reshape(nh * nww, n, hd).astype(jnp.float32) * scale
    k = k.reshape(nh * nww, n, hd).astype(jnp.float32)
    v = v.reshape(nh * nww, n, hd)

    attn = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)      # (nH*nWw, N, N)
    attn = attn.reshape(nh, nww, n, n) + bias_ref[:][:, None]

    if shift:
        # shift mask from region ids (reference img_mask, :370-389),
        # built directly at (nWw, N) to avoid lane-dim reshapes.
        t = jax.lax.broadcasted_iota(jnp.int32, (nww, n), 1)
        j = jax.lax.broadcasted_iota(jnp.int32, (nww, n), 0)
        rrow = i * ws + t // ws                               # rolled row
        rcol = j * ws + t % ws                                # rolled col
        rh = jnp.where(rrow < hp - ws, 0,
                       jnp.where(rrow < hp - shift, 1, 2))
        rw = jnp.where(rcol < wp - ws, 0,
                       jnp.where(rcol < wp - shift, 1, 2))
        reg = 3 * rh + rw                                     # (nWw, N)
        diff = reg[:, :, None] != reg[:, None, :]
        attn = attn + jnp.where(diff, -100.0, 0.0)[None]

    attn = jax.nn.softmax(attn, axis=-1).reshape(nh * nww, n, n)
    out = jax.lax.dot_general(
        attn.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)      # (nH*nWw, N, hd)
    out = out.reshape(nh, nww, n, hd)
    # heads back onto lanes via concat (no lane-dim reshape)
    o = jnp.concatenate([out[h] for h in range(nh)], axis=-1)
    o = o.reshape(nww, ws, ws, c).transpose(1, 0, 2, 3)
    out_ref[0] = o.reshape(ws, wp, c).astype(out_ref.dtype)


def swin_window_attention(qkv: jnp.ndarray, bias: jnp.ndarray,
                          ws: int, shift: int, num_heads: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Differentiable fused SW-MSA over the padded qkv map.

    qkv:  (B, Hp, Wp, 3C), Hp/Wp multiples of ws (zero-padded — pad
          tokens participate in boundary windows exactly like the
          reference's F.pad zeros).
    bias: (nH, N, N) relative position bias (fp32).
    Returns attention output (B, Hp, Wp, C) in ROLLED coordinates when
    shift > 0 — caller applies jnp.roll(out, (shift, shift), (1, 2)).
    """
    return _swin_attn_vjp(qkv, bias, ws, shift, num_heads, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _swin_attn_vjp(qkv, bias, ws, shift, num_heads, interpret):
    return _swin_attn_fwd_impl(qkv, bias, ws, shift, num_heads,
                               interpret)


def _swin_attn_fwd_impl(qkv, bias, ws, shift, num_heads, interpret):
    b, hp, wp, c3 = qkv.shape
    c = c3 // 3
    nhb = hp // ws
    hd = c // num_heads
    scale = hd ** -0.5
    grid = (b, nhb)
    kernel = functools.partial(
        _swin_attn_kernel, ws=ws, shift=shift, nh=num_heads, hp=hp,
        wp=wp, scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws, wp, c3), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ws, wp, c3),
                         lambda bi, i: (bi, (i + 1) % pl.num_programs(1),
                                        0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, ws * ws, ws * ws),
                         lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, wp, c),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkv, qkv, bias)


def swin_attention_reference(qkv: jnp.ndarray, bias: jnp.ndarray,
                             ws: int, shift: int,
                             num_heads: int) -> jnp.ndarray:
    """lax spec: same math via explicit roll/partition (used for parity
    tests and the custom-VJP recompute backward). Returns ROLLED-coord
    output like the kernel."""
    b, hp, wp, c3 = qkv.shape
    c = c3 // 3
    if shift:
        qkv = jnp.roll(qkv, (-shift, -shift), axis=(1, 2))
    x = qkv.reshape(b, hp // ws, ws, wp // ws, ws, c3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c3)
    from ..models.backbones.swin import shifted_window_attn_mask
    mask = shifted_window_attn_mask(hp, wp, ws, shift)
    mask = None if mask is None else jnp.asarray(mask)
    out = window_attention_reference(x, bias, mask, num_heads)
    out = out.reshape(b, hp // ws, wp // ws, ws, ws, c)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    return out


def _swin_vjp_fwd(qkv, bias, ws, shift, num_heads, interpret):
    out = _swin_attn_fwd_impl(qkv, bias, ws, shift, num_heads, interpret)
    return out, (qkv, bias)


def _swin_vjp_bwd(ws, shift, num_heads, interpret, res, g):
    qkv, bias = res
    _, vjp = jax.vjp(
        lambda a, b: swin_attention_reference(a, b, ws, shift, num_heads),
        qkv, bias)
    return vjp(g)


_swin_attn_vjp.defvjp(_swin_vjp_fwd, _swin_vjp_bwd)
