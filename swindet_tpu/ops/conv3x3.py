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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3(x, w, b, relu: bool = False, interpret: bool = False):
    """Differentiable fused conv3x3(+bias+relu); Pallas forward,
    lax-conv backward."""
    return conv3x3_fwd(x, w, b, relu, interpret=interpret)


def _c3_fwd(x, w, b, relu, interpret):
    return conv3x3_fwd(x, w, b, relu, interpret=interpret), (x, w, b)


def _c3_bwd(relu, interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda a, ww, bb: conv3x3_reference(a, ww, bb, relu),
                     x, w, b)
    return vjp(g)


conv3x3.defvjp(_c3_fwd, _c3_bwd)
