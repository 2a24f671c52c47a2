"""3×3 stride-1 SAME convolution — Pallas TPU kernel.

XLA's conv on this model picks a transposed {3,0,2,1} layout for the
big FPN/RPN 3×3 convs (B=1 lands on sublanes) and runs at ~16% MXU;
this kernel keeps the standard NHWC row-major layout and computes the
conv as 9 accumulated (rows·W, C)×(C, C) MXU matmuls over row blocks
with one-row halos (profiled: 2.2 ms → MXU-bound ~0.5 ms at 800×1344).

Optionally fuses bias + ReLU. Differentiable via custom VJP (lax conv
backward).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(prev_ref, cur_ref, nxt_ref, w_ref, b_ref, out_ref, *,
                 relu: bool, rows: int):
    i = pl.program_id(0)
    n_blk = pl.num_programs(0)
    _, r, wd, c = cur_ref.shape
    co = w_ref.shape[3]

    top = jnp.where(i == 0, 0.0, 1.0) * prev_ref[0]      # (1, W, C)
    bot = jnp.where(i == n_blk - 1, 0.0, 1.0) * nxt_ref[0]
    x = jnp.concatenate([top, cur_ref[0], bot], axis=0)  # (r+2, W, C)
    # pad W by 1 on both sides (zeros)
    zcol = jnp.zeros((r + 2, 1, c), x.dtype)
    x = jnp.concatenate([zcol, x, zcol], axis=1)         # (r+2, W+2, C)

    acc = jnp.zeros((r, wd, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = x[dy:dy + r, dx:dx + wd, :]
            acc = acc + jax.lax.dot_general(
                sl, w_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)[None, None]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.astype(out_ref.dtype)


def conv3x3_fwd(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                relu: bool = False, rows: int = 8,
                interpret: bool = False) -> jnp.ndarray:
    """x (B, H, W, C), w (3, 3, C, Co), b (Co,). H must divide rows."""
    bs, h, wd, c = x.shape
    co = w.shape[3]
    # Row-block size vs the 16MB VMEM budget (double-buffered blocks +
    # in-kernel padded copy + fp32 accumulator): 8 rows fits bf16 at
    # detection shapes (empirically ~14MB at W=336, C=256); fp32 needs 2.
    if x.dtype.itemsize >= 4:
        rows = min(rows, 2)
    if wd * c > 336 * 256:
        rows = min(rows, 4 if x.dtype.itemsize == 2 else 1)
    while rows > 1 and h % rows:
        rows //= 2
    nb = h // rows
    grid = (nb, bs)
    kern = functools.partial(_conv_kernel, relu=relu, rows=rows)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bs, h, wd, co), x.dtype),
        grid=grid,
        in_specs=[
            # one-row halos (block shape 1 in H → arbitrary row offsets)
            pl.BlockSpec((1, 1, wd, c),
                         lambda i, bi: (bi, jnp.maximum(
                             i * rows - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, wd, c),
                         lambda i, bi: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wd, c),
                         lambda i, bi: (bi, jnp.minimum(
                             (i + 1) * rows, h - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, co), lambda i, bi: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((co,), lambda i, bi: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, wd, co),
                               lambda i, bi: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, w, b)


def conv3x3_reference(x, w, b, relu=False):
    # fp32 operands: mixed-dtype transpose rules break the VJP when only
    # preferred_element_type upcasts (cotangent fp32 vs bf16 kernel)
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    out = out + b.astype(jnp.float32)[None, None, None]
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(x.dtype)


def _dw_kernel(prev_ref, cur_ref, nxt_ref, g_ref, dw_ref, *, rows: int):
    """Filter gradient: dw[dy,dx] += x_shift(dy,dx)^T · g over one row
    block, accumulated across the sequential grid into the single
    (3,3,C,Co) fp32 block. 9 GEMMs with K = rows·W — MXU-shaped (the
    XLA filter-grad conv runs transposed at 30-40% MXU on this model)."""
    i = pl.program_id(0)
    bi = pl.program_id(1)
    n_blk = pl.num_programs(0)
    _, r, wd, c = cur_ref.shape
    co = g_ref.shape[3]

    top = jnp.where(i == 0, 0.0, 1.0) * prev_ref[0]      # (1, W, C)
    bot = jnp.where(i == n_blk - 1, 0.0, 1.0) * nxt_ref[0]
    x = jnp.concatenate([top, cur_ref[0], bot], axis=0)  # (r+2, W, C)
    zcol = jnp.zeros((r + 2, 1, c), x.dtype)
    x = jnp.concatenate([zcol, x, zcol], axis=1)         # (r+2, W+2, C)
    g2 = g_ref[0].reshape(r * wd, co)

    @pl.when((i == 0) & (bi == 0))
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    for dy in range(3):
        for dx in range(3):
            sl = x[dy:dy + r, dx:dx + wd, :].reshape(r * wd, c)
            dw_ref[dy, dx] += jax.lax.dot_general(
                sl, g2, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _conv3x3_dw(x: jnp.ndarray, g: jnp.ndarray, rows: int = 8,
                interpret: bool = False) -> jnp.ndarray:
    """dL/dw for a 3×3/s1 SAME conv: x (B,H,W,C), g (B,H,W,Co) →
    (3,3,C,Co) fp32."""
    bs, h, wd, c = x.shape
    co = g.shape[3]
    if x.dtype.itemsize >= 4:
        rows = min(rows, 2)
    if wd * c > 336 * 256:
        rows = min(rows, 4 if x.dtype.itemsize == 2 else 1)
    while rows > 1 and h % rows:
        rows //= 2
    nb = h // rows
    grid = (nb, bs)
    kern = functools.partial(_dw_kernel, rows=rows)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((3, 3, c, co), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, wd, c),
                         lambda i, bi: (bi, jnp.maximum(
                             i * rows - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, wd, c),
                         lambda i, bi: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wd, c),
                         lambda i, bi: (bi, jnp.minimum(
                             (i + 1) * rows, h - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, wd, co),
                         lambda i, bi: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, c, co), lambda i, bi: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, g)


def conv3x3_bwd_pallas(x, w, b, out, relu, g, interpret=False):
    """Pallas backward of conv3x3(+bias+relu):
      dx = conv3x3(g_masked, rot180(w)^T)   (another 3×3/s1 SAME conv)
      dw = Σ_blocks x_shift^T · g_masked    (_dw_kernel)
      db = Σ g_masked
    relu masking uses the saved forward output (no recompute conv)."""
    if relu:
        g = g * (out > 0).astype(g.dtype)
    # rot180 + (C,Co)->(Co,C): dx is a plain SAME conv of g with w'
    wt = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = conv3x3_fwd(g, wt.astype(g.dtype),
                     jnp.zeros((x.shape[-1],), g.dtype),
                     relu=False, interpret=interpret)
    dw = _conv3x3_dw(x, g, interpret=interpret).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(b.dtype)
    return dx.astype(x.dtype), dw, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3(x, w, b, relu: bool = False, interpret: bool = False):
    """Differentiable fused conv3x3(+bias+relu); Pallas forward AND
    backward on TPU (lax-conv backward elsewhere)."""
    return conv3x3_fwd(x, w, b, relu, interpret=interpret)


def _c3_fwd(x, w, b, relu, interpret):
    out = conv3x3_fwd(x, w, b, relu, interpret=interpret)
    # save out only when the relu mask needs it (otherwise dead)
    return out, (x, w, b, out if relu else None)


def _c3_bwd(relu, interpret, res, g):
    x, w, b, out = res
    use_pallas = (interpret or jax.default_backend() == 'tpu') and \
        not os.environ.get('SWINDET_XLA_CONV_BWD')
    if use_pallas:
        return conv3x3_bwd_pallas(x, w, b, out, relu, g,
                                  interpret=interpret)
    _, vjp = jax.vjp(lambda a, ww, bb: conv3x3_reference(a, ww, bb, relu),
                     x, w, b)
    return vjp(g)


conv3x3.defvjp(_c3_fwd, _c3_bwd)
