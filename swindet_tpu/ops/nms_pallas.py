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
            buf_ref, cnt_ref, iou_scr,
            *, iou_thr: float, max_out: int, num_tiles: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        buf_ref[...] = jnp.zeros_like(buf_ref)
        cnt_ref[0] = 0
        dets_ref[...] = jnp.zeros_like(dets_ref)
        inds_ref[...] = jnp.zeros_like(inds_ref)
        cnt_out_ref[...] = jnp.zeros_like(cnt_out_ref)

    # Everything below stays rank-2 with strided slices / transposes
    # only — integer or newaxis indexing lowers to lax.gather, which
    # Mosaic rejects for these shapes.
    tb = boxes_ref[...].astype(jnp.float32)          # (T, 4)
    tbT = jnp.transpose(tb)                          # (4, T)
    ts = scores_ref[0].astype(jnp.float32)           # (1, T)
    tv = valid_ref[0] > 0                            # (1, T)
    to = order_ref[0]                                # (1, T) int32
    cnt = cnt_ref[0]

    buf = buf_ref[...]                               # (max_out, 4)
    # ---- IoU of the tile vs the kept buffer (max_out, T)
    area_b = jnp.maximum(buf[:, 2:3] - buf[:, 0:1], 0) * \
        jnp.maximum(buf[:, 3:4] - buf[:, 1:2], 0)    # (max_out, 1)
    area_t = jnp.maximum(tbT[2:3] - tbT[0:1], 0) * \
        jnp.maximum(tbT[3:4] - tbT[1:2], 0)          # (1, T)
    lt_x = jnp.maximum(buf[:, 0:1], tbT[0:1])
    lt_y = jnp.maximum(buf[:, 1:2], tbT[1:2])
    rb_x = jnp.minimum(buf[:, 2:3], tbT[2:3])
    rb_y = jnp.minimum(buf[:, 3:4], tbT[3:4])
    inter = jnp.maximum(rb_x - lt_x, 0) * jnp.maximum(rb_y - lt_y, 0)
    union = area_b + area_t - inter
    iou_x = inter / jnp.maximum(union, 1e-10)
    # 2-D iotas (Mosaic requires rank >= 2)
    buf_alive = jax.lax.broadcasted_iota(
        jnp.int32, (max_out, 1), 0) < cnt            # (max_out, 1)
    sup = jnp.any((iou_x > iou_thr) & buf_alive, axis=0,
                  keepdims=True)                     # (1, T)
    alive = tv & ~sup                                # (1, T)

    # ---- exact within-tile sequential suppression
    lt_x = jnp.maximum(tb[:, 0:1], tbT[0:1])
    lt_y = jnp.maximum(tb[:, 1:2], tbT[1:2])
    rb_x = jnp.minimum(tb[:, 2:3], tbT[2:3])
    rb_y = jnp.minimum(tb[:, 3:4], tbT[3:4])
    inter = jnp.maximum(rb_x - lt_x, 0) * jnp.maximum(rb_y - lt_y, 0)
    union = jnp.transpose(area_t) + area_t - inter
    # Mosaic has no dynamic_slice on register values — stage the IoU
    # matrix in VMEM scratch and row-index the ref with pl.ds instead.
    iou_scr[...] = inter / jnp.maximum(union, 1e-10)  # (T, T)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)

    def row(r, al):
        # al is the alive mask carried as int32 — i1 vectors as loop
        # carriers fail Mosaic's scf.for legalization
        arow = iou_scr[pl.ds(r, 1), :]               # (1, T)
        ar = jnp.sum(al * (col == r).astype(jnp.int32))
        kill = ((arow > iou_thr) & (col > r)).astype(jnp.int32) \
            * jnp.minimum(ar, 1)
        return al * (1 - kill)

    alive = jax.lax.fori_loop(0, TILE, row,
                              alive.astype(jnp.int32)) > 0

    # ---- append survivors via one-hot matmuls (no scatters)
    # cumsum has no Mosaic lowering — inclusive prefix sum as a matmul
    # against a lower-triangular ones matrix (MXU).
    tri = (jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0) <=
           jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1))
    csum = jax.lax.dot(alive.astype(jnp.float32),
                       tri.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
    pos = cnt + csum.astype(jnp.int32) - 1
    pos = jnp.where(alive, pos, -1)                  # (1, T)
    rows = jax.lax.broadcasted_iota(jnp.int32, (max_out, TILE), 0)
    sel = (rows == pos).astype(jnp.float32)          # (max_out, T)
    buf_ref[...] = buf + jax.lax.dot(
        sel, tb, precision=jax.lax.Precision.HIGHEST)
    ts_col = jnp.transpose(jnp.where(alive, ts, 0.0))  # (T, 1)
    dets_ref[...] += jnp.concatenate(
        [jax.lax.dot(sel, tb, precision=jax.lax.Precision.HIGHEST),
         jax.lax.dot(sel, ts_col,
                     precision=jax.lax.Precision.HIGHEST)], axis=-1)
    inds_ref[...] += jnp.sum(sel.astype(jnp.int32) * to, axis=1,
                             keepdims=True)          # (max_out, 1)
    cnt = cnt + jnp.sum(alive.astype(jnp.int32))
    cnt_ref[0] = cnt

    @pl.when(i == num_tiles - 1)
    def _fin():
        # scalar stores to VMEM are rejected — write a (1,1) vector
        cnt_out_ref[...] = jnp.full((1, 1), 0, jnp.int32) + \
            jnp.minimum(cnt, max_out)


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
            pl.BlockSpec((max_out, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((max_out, 5), jnp.float32),
            jax.ShapeDtypeStruct((max_out, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((max_out, 4), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((TILE, TILE), jnp.float32),
        ],
        interpret=interpret,
    )(boxes_s.astype(jnp.float32),
      score_s.reshape(num_tiles, 1, TILE).astype(jnp.float32),
      valid_s.reshape(num_tiles, 1, TILE).astype(jnp.int32),
      order.reshape(num_tiles, 1, TILE).astype(jnp.int32))
    return dets, inds[:, 0], cnt[0, 0]
