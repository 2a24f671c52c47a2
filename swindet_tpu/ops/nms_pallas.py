"""Greedy NMS as ONE Pallas kernel (replaces the XLA fori+while
formulation in core/nms.py `nms` when enabled).

Why: the exact XLA version runs a `while_loop` fixpoint per 128-box
tile inside a `fori_loop`, and every iteration is a separately
sequenced small op on the TPU — PERF.md attributes ~4 ms/img of the
structured-input bench to these rounds. Here the whole scan is a
single kernel over a sequential grid:

- grid step i owns score-tile i (the TPU grid is sequential, so VMEM
  scratch carries the kept-box buffer and SMEM the count across steps);
- cross-suppression against the kept buffer is one (max_out, T) IoU
  evaluation (VPU);
- within-tile resolution is an in-register `fori_loop` over the 128
  rows — exact sequential semantics, no Jacobi rounds, no per-iteration
  dispatch;
- survivors are appended with a one-hot selection matmul (MXU), so no
  scatters.

Inputs must be pre-sorted by score (same contract as the XLA path).
Semantics match `core/nms.py nms` exactly — the keep SET and order are
identical; `SWINDET_PALLAS_NMS=1` flips `nms()` onto this kernel on
TPU (off by default until benchmarked).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

TILE = 128


def _kernel(boxes_ref, scores_ref, valid_ref, order_ref,
            dets_ref, inds_ref, cnt_out_ref,
            buf_ref, cnt_ref,
            *, iou_thr: float, max_out: int, num_tiles: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        buf_ref[...] = jnp.zeros_like(buf_ref)
        cnt_ref[0] = 0
        dets_ref[...] = jnp.zeros_like(dets_ref)
        inds_ref[...] = jnp.zeros_like(inds_ref)
        cnt_out_ref[...] = jnp.zeros_like(cnt_out_ref)

    tb = boxes_ref[...].astype(jnp.float32)          # (T, 4)
    ts = scores_ref[0, 0].astype(jnp.float32)        # (T,)
    tv = valid_ref[0, 0] > 0                         # (T,)
    to = order_ref[0, 0]                             # (T,) int32
    cnt = cnt_ref[0]

    buf = buf_ref[...]                               # (max_out, 4)
    # ---- IoU of the tile vs the kept buffer (max_out, T)
    area_b = jnp.maximum(buf[:, 2] - buf[:, 0], 0) * \
        jnp.maximum(buf[:, 3] - buf[:, 1], 0)
    area_t = jnp.maximum(tb[:, 2] - tb[:, 0], 0) * \
        jnp.maximum(tb[:, 3] - tb[:, 1], 0)
    lt_x = jnp.maximum(buf[:, None, 0], tb[None, :, 0])
    lt_y = jnp.maximum(buf[:, None, 1], tb[None, :, 1])
    rb_x = jnp.minimum(buf[:, None, 2], tb[None, :, 2])
    rb_y = jnp.minimum(buf[:, None, 3], tb[None, :, 3])
    inter = jnp.maximum(rb_x - lt_x, 0) * jnp.maximum(rb_y - lt_y, 0)
    union = area_b[:, None] + area_t[None, :] - inter
    iou_x = inter / jnp.maximum(union, 1e-10)
    # 2-D iotas (Mosaic requires rank >= 2)
    buf_alive = jax.lax.broadcasted_iota(
        jnp.int32, (max_out, 1), 0)[:, 0] < cnt
    sup = jnp.any((iou_x > iou_thr) & buf_alive[:, None], axis=0)
    alive = tv & ~sup

    # ---- exact within-tile sequential suppression
    lt_x = jnp.maximum(tb[:, None, 0], tb[None, :, 0])
    lt_y = jnp.maximum(tb[:, None, 1], tb[None, :, 1])
    rb_x = jnp.minimum(tb[:, None, 2], tb[None, :, 2])
    rb_y = jnp.minimum(tb[:, None, 3], tb[None, :, 3])
    inter = jnp.maximum(rb_x - lt_x, 0) * jnp.maximum(rb_y - lt_y, 0)
    union = area_t[:, None] + area_t[None, :] - inter
    iou_s = inter / jnp.maximum(union, 1e-10)        # (T, T)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)[0]

    def row(r, al):
        arow = jax.lax.dynamic_slice(iou_s, (r, 0), (1, TILE))[0]
        ar = jnp.sum(jnp.where(col == r, al, False))  # alive[r] as scalar
        kill = (arow > iou_thr) & (col > r) & (ar > 0)
        return al & ~kill

    alive = jax.lax.fori_loop(0, TILE, row, alive)

    # ---- append survivors via one-hot matmuls (no scatters)
    pos = cnt + jnp.cumsum(alive.astype(jnp.int32)) - 1
    pos = jnp.where(alive, pos, -1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (max_out, TILE), 0)
    sel = (rows == pos[None, :]).astype(jnp.float32)  # (max_out, T)
    buf_ref[...] = buf + jax.lax.dot(
        sel, tb, precision=jax.lax.Precision.HIGHEST)
    dets_ref[...] += jnp.concatenate(
        [jax.lax.dot(sel, tb, precision=jax.lax.Precision.HIGHEST),
         jax.lax.dot(sel, jnp.where(alive, ts, 0.0)[:, None],
                     precision=jax.lax.Precision.HIGHEST)], axis=-1)
    inds_ref[...] += jnp.sum(
        sel.astype(jnp.int32) * to[None, :], axis=1)[None, :]
    cnt = cnt + jnp.sum(alive.astype(jnp.int32))
    cnt_ref[0] = cnt

    @pl.when(i == num_tiles - 1)
    def _fin():
        cnt_out_ref[0, 0] = jnp.minimum(cnt, max_out)


def nms_pallas_sorted(boxes_s: jnp.ndarray, score_s: jnp.ndarray,
                      valid_s: jnp.ndarray, order: jnp.ndarray,
                      iou_threshold: float, max_out: int,
                      interpret: bool = False):
    """Run the kernel on score-SORTED padded inputs (N multiple of 128).
    Returns (dets (max_out, 5), inds (max_out,), count ())."""
    n = boxes_s.shape[0]
    assert n % TILE == 0, n
    num_tiles = n // TILE
    dets, inds, cnt = pl.pallas_call(
        partial(_kernel, iou_thr=float(iou_threshold),
                max_out=max_out, num_tiles=num_tiles),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, 4), lambda i: (i, 0)),
            # tile vectors carried as (tiles, 1, T): Mosaic requires the
            # block's last-two dims be (mult-of-8 | full, mult-of-128 |
            # full) — (1=full, 128) qualifies, (1, 128) over (tiles, 128)
            # does not.
            pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((max_out, 5), lambda i: (0, 0)),
            pl.BlockSpec((1, max_out), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((max_out, 5), jnp.float32),
            jax.ShapeDtypeStruct((1, max_out), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((max_out, 4), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(boxes_s.astype(jnp.float32),
      score_s.reshape(num_tiles, 1, TILE).astype(jnp.float32),
      valid_s.reshape(num_tiles, 1, TILE).astype(jnp.int32),
      order.reshape(num_tiles, 1, TILE).astype(jnp.int32))
    return dets, inds[0], cnt[0, 0]
