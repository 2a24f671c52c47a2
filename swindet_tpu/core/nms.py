"""Exact NMS as a TPU-friendly tiled algorithm.

Replaces the reference's mmcv CUDA ``nms``/``batched_nms`` (reference:
mmdet/core/post_processing/bbox_nms.py:7, rpn_head.py:233). Design:

- Boxes are sorted by score once; processed in score-order tiles of 128.
- A running buffer of at most ``max_out`` *kept* boxes is maintained; each
  tile is suppressed against the buffer with one (T, max_out) IoU matrix,
  then self-suppressed within the tile by Jacobi fixpoint iteration
  (suppression only flows from higher to lower score, so the iteration
  converges to the exact sequential-NMS answer; typically <10 rounds).
- Sequential latency is O(num_tiles + fixpoint rounds), not O(N), and all
  inner work is dense (T, K) vector ops that map onto the VPU.

Everything is static-shape: inputs padded, outputs are (max_out,) slots
plus a validity mask.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp

import os as _os

# Score-order tile width. Larger tiles mean fewer sequential tile steps
# (each a while_loop iteration with real dispatch latency) but a larger
# (T, T) self-IoU fixpoint. A/B on the v5e (.dev_scripts/bench_nms.py
# + bench.py): 512 beats 128 by ~29% on large-N single-class NMS and
# +0.23 img/s end-to-end; keep sets are exact at any tile width.
TILE = int(_os.environ.get('SWINDET_NMS_TILE', 512))


class NMSResult(NamedTuple):
    dets: jnp.ndarray    # (max_out, 5) — x1, y1, x2, y2, score
    inds: jnp.ndarray    # (max_out,) int32 indices into the input arrays
    valid: jnp.ndarray   # (max_out,) bool


def fast_topk(scores: jnp.ndarray, k: int):
    """Candidate-pool top-k. Exact by default (eval numerics must match
    the reference's sort-based selection); set SWINDET_APPROX_TOPK=1 to
    opt into TPU approx_max_k (recall ≈0.99 — only affects which
    low-scoring candidates enter NMS; fine for training-time proposals,
    unproven for mAP parity)."""
    import os
    import jax
    if (jax.default_backend() == 'tpu'
            and os.environ.get('SWINDET_APPROX_TOPK')):
        return jax.lax.approx_max_k(scores, k, recall_target=0.99)
    return jax.lax.top_k(scores, k)


def _pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(M, 4) × (K, 4) → (M, K) IoU; degenerate boxes give 0."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-10)


def _self_suppress(iou: jnp.ndarray, init_alive: jnp.ndarray,
                   iou_threshold: float) -> jnp.ndarray:
    """Exact within-tile NMS via fixpoint iteration.

    ``iou`` is (T, T) of score-sorted boxes; row i may suppress col j>i.
    Jacobi iteration: a box is dead iff some *alive* higher-scored box
    overlaps it. Converges monotonically along the score order.
    """
    t = iou.shape[0]
    row = jnp.arange(t)
    strict_upper = row[:, None] < row[None, :]
    can = (iou > iou_threshold) & strict_upper

    def cond(state):
        alive, prev_alive, it = state
        return (it < t) & jnp.any(alive != prev_alive)

    def body(state):
        alive, _, it = state
        suppressed = jnp.any(can & alive[:, None], axis=0)
        new_alive = init_alive & ~suppressed
        return new_alive, alive, it + 1

    # one seed iteration so cond sees a change on entry
    alive0 = init_alive
    alive1 = init_alive & ~jnp.any(can & alive0[:, None], axis=0)
    alive, _, _ = jax.lax.while_loop(cond, body, (alive1, alive0, jnp.int32(0)))
    return alive


def nms(boxes: jnp.ndarray, scores: jnp.ndarray,
        iou_threshold: float, max_out: int,
        valid: Optional[jnp.ndarray] = None) -> NMSResult:
    """Exact greedy NMS over padded inputs.

    Args:
        boxes: (N, 4); scores: (N,); valid: (N,) bool or None.
        max_out: static output capacity (kept boxes beyond this dropped).
    Returns score-ordered kept detections.

    Precondition: every ``valid`` candidate must carry a finite score —
    the tiled early exit counts live tiles as ``ceil(sum(valid)/TILE)``
    after the score sort, so a valid box scored -inf/NaN would sort into
    the padded block and be dropped. All callers satisfy this
    (multiclass_nms defines validity as score > thr; head logits are
    finite).

    Non-differentiable: the tile scan is a ``lax.while_loop`` (no
    reverse-mode AD). Safe because proposals are stop_gradient'd before
    NMS (detectors/two_stage.py) and no training loss backprops through
    test-time NMS.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    score = jnp.where(valid, scores, -jnp.inf)

    order = jnp.argsort(-score)
    boxes_s = jnp.take(boxes, order, axis=0)
    score_s = jnp.take(score, order)
    valid_s = jnp.take(valid, order)

    n_pad = ((n + TILE - 1) // TILE) * TILE
    pad = n_pad - n
    if pad:
        boxes_s = jnp.pad(boxes_s, ((0, pad), (0, 0)))
        score_s = jnp.pad(score_s, (0, pad), constant_values=-jnp.inf)
        valid_s = jnp.pad(valid_s, (0, pad))
        order = jnp.pad(order, (0, pad))
    num_tiles = n_pad // TILE

    import os
    if jax.default_backend() == 'tpu' and \
            os.environ.get('SWINDET_PALLAS_NMS'):
        # single-kernel scan (ops/nms_pallas.py) — same keep set/order;
        # opt-in until benchmarked on hardware
        from ..ops.nms_pallas import nms_pallas_sorted
        dets_p, inds_p, cnt_p = nms_pallas_sorted(
            boxes_s, score_s, valid_s, order, iou_threshold, max_out)
        out_valid = jnp.arange(max_out) < cnt_p
        dets_p = jnp.where(out_valid[:, None], dets_p, 0.0)
        return NMSResult(dets=dets_p, inds=inds_p, valid=out_valid)

    buf_boxes0 = jnp.zeros((max_out, 4), boxes.dtype)
    buf_scores0 = jnp.full((max_out,), -jnp.inf, score_s.dtype)
    buf_inds0 = jnp.zeros((max_out,), jnp.int32)

    # Exact early exit: invalid/padded candidates sort to the back, so
    # tiles past the last live one can't change state; and once the kept
    # buffer is full (count == max_out) every later append is dropped
    # (tiles arrive in descending score order, so the buffer is final).
    # Both conditions preserve the exact sequential-NMS keep set while
    # cutting the sequential trip count from ceil(N/T) to the live tiles
    # actually needed (multiclass NMS pads to 2048 but typically only a
    # few hundred candidates clear score_thr).
    n_live = jnp.sum(valid_s.astype(jnp.int32))
    live_tiles = (n_live + TILE - 1) // TILE

    def tile_step(i, state):
        buf_boxes, buf_scores, buf_inds, count = state
        sl = i * TILE
        tb = jax.lax.dynamic_slice(boxes_s, (sl, 0), (TILE, 4))
        ts = jax.lax.dynamic_slice(score_s, (sl,), (TILE,))
        tv = jax.lax.dynamic_slice(valid_s, (sl,), (TILE,))
        to = jax.lax.dynamic_slice(order, (sl,), (TILE,))

        # cross-suppression vs already-kept boxes
        buf_alive = jnp.arange(max_out) < count
        iou_x = _pairwise_iou(buf_boxes, tb)               # (max_out, T)
        sup = jnp.any((iou_x > iou_threshold) & buf_alive[:, None], axis=0)
        alive = tv & ~sup

        # self-suppression within the tile
        iou_self = _pairwise_iou(tb, tb)
        alive = _self_suppress(iou_self, alive, iou_threshold)

        # append survivors to the buffer in score order
        pos = count + jnp.cumsum(alive.astype(jnp.int32)) - 1
        pos = jnp.where(alive, pos, max_out)               # drop non-alive
        buf_boxes = buf_boxes.at[pos].set(tb, mode='drop')
        buf_scores = buf_scores.at[pos].set(ts, mode='drop')
        buf_inds = buf_inds.at[pos].set(to.astype(jnp.int32), mode='drop')
        count = jnp.minimum(count + jnp.sum(alive.astype(jnp.int32)),
                            max_out)
        return buf_boxes, buf_scores, buf_inds, count

    def loop_cond(carry):
        i, (_, _, _, count) = carry
        # live_tiles <= num_tiles always (n_live <= n_pad); the
        # `i < num_tiles` term is a belt-and-suspenders bound only.
        return (i < num_tiles) & (i < live_tiles) & (count < max_out)

    def loop_body(carry):
        i, state = carry
        return i + 1, tile_step(i, state)

    _, (buf_boxes, buf_scores, buf_inds, count) = jax.lax.while_loop(
        loop_cond, loop_body,
        (jnp.int32(0), (buf_boxes0, buf_scores0, buf_inds0, jnp.int32(0))))

    out_valid = jnp.arange(max_out) < count
    dets = jnp.concatenate(
        [buf_boxes, jnp.where(out_valid, buf_scores, 0.0)[:, None]], axis=-1)
    dets = jnp.where(out_valid[:, None], dets, 0.0)
    return NMSResult(dets=dets, inds=buf_inds, valid=out_valid)


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                idxs: jnp.ndarray, iou_threshold: float, max_out: int,
                valid: Optional[jnp.ndarray] = None,
                class_agnostic: bool = False) -> NMSResult:
    """NMS where boxes of different ``idxs`` never suppress each other,
    via the class-offset trick (reference: bbox_nms.py batched_nms)."""
    if class_agnostic:
        return nms(boxes, scores, iou_threshold, max_out, valid)
    max_coord = jnp.max(jnp.where(
        valid[:, None] if valid is not None else True, boxes, 0.0))
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    res = nms(shifted, scores, iou_threshold, max_out, valid)
    # un-shift the kept boxes
    kept_off = jnp.take(offsets, res.inds)
    dets_boxes = res.dets[:, :4] - jnp.where(
        res.valid, kept_off, 0.0)[:, None]
    dets = jnp.concatenate([dets_boxes, res.dets[:, 4:]], axis=-1)
    dets = jnp.where(res.valid[:, None], dets, 0.0)
    return NMSResult(dets=dets, inds=res.inds, valid=res.valid)


class MulticlassNMSResult(NamedTuple):
    dets: jnp.ndarray     # (max_per_img, 5)
    labels: jnp.ndarray   # (max_per_img,) int32
    inds: jnp.ndarray     # (max_per_img,) int32 — index into the N boxes
    valid: jnp.ndarray    # (max_per_img,) bool


def multiclass_nms(multi_bboxes: jnp.ndarray,
                   multi_scores: jnp.ndarray,
                   score_thr: float,
                   nms_cfg: dict,
                   max_per_img: int = -1,
                   score_factors: Optional[jnp.ndarray] = None,
                   valid: Optional[jnp.ndarray] = None,
                   pre_nms_cap: int = 2048) -> MulticlassNMSResult:
    """Class-aware NMS over (N, #cls*4 or 4) boxes and (N, #cls+1) scores
    (reference: bbox_nms.py:7 — last score column is background, dropped).

    Candidates below ``score_thr`` are masked; the global top
    ``pre_nms_cap`` candidates across all (box, class) pairs enter one
    batched NMS (headroom >> ``max_per_img``, matching the reference's
    unpadded behaviour in practice).
    """
    n = multi_scores.shape[0]
    num_classes = multi_scores.shape[1] - 1
    scores = multi_scores[:, :-1]                       # (N, C)
    if multi_bboxes.shape[-1] > 4:
        bboxes = multi_bboxes.reshape(n, num_classes, 4)
    else:
        bboxes = jnp.broadcast_to(multi_bboxes[:, None, :],
                                  (n, num_classes, 4))
    if score_factors is not None:
        scores = scores * score_factors[:, None]

    cand_mask = scores > score_thr
    if valid is not None:
        cand_mask &= valid[:, None]

    flat_scores = jnp.where(cand_mask, scores, -jnp.inf).reshape(-1)
    cap = min(pre_nms_cap, flat_scores.shape[0])
    top_scores, top_idx = fast_topk(flat_scores, cap)
    top_box_idx = top_idx // num_classes
    top_cls = (top_idx % num_classes).astype(jnp.int32)
    top_boxes = bboxes.reshape(-1, 4)[top_idx]
    top_valid = top_scores > -jnp.inf

    max_out = max_per_img if max_per_img > 0 else cap
    res = batched_nms(top_boxes, jnp.where(top_valid, top_scores, -jnp.inf),
                      top_cls, nms_cfg['iou_threshold'], max_out,
                      valid=top_valid)
    labels = jnp.where(res.valid, jnp.take(top_cls, res.inds), 0)
    box_inds = jnp.where(res.valid,
                         jnp.take(top_box_idx, res.inds).astype(jnp.int32), 0)
    return MulticlassNMSResult(dets=res.dets, labels=labels,
                               inds=box_inds, valid=res.valid)


def nms_match(dets: jnp.ndarray, iou_threshold: float,
              valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Greedy NMS clustering (mmcv ``nms_match`` semantics, used by
    ScoreHLRSampler): every box is matched to the highest-scored kept
    box that suppresses it.

    Static-shape formulation: instead of the reference's list of index
    groups, returns (N,) int32 group ids — ``group[i]`` is the index of
    the kept box whose cluster ``i`` belongs to (``group[i] == i`` for
    kept boxes, ``-1`` for invalid).
    """
    n = dets.shape[0]
    boxes, scores = dets[:, :4], dets[:, 4]
    if valid is None:
        valid = jnp.ones((n,), bool)
    res = nms(boxes, scores, iou_threshold, n, valid=valid)
    kept = jnp.zeros((n,), bool).at[res.inds].max(res.valid, mode='drop')
    iou = _pairwise_iou(boxes, boxes)                  # (N, N)
    # candidate keepers: kept boxes with IoU > thr (self IoU = 1 > thr)
    can = kept[None, :] & (iou > iou_threshold) & valid[:, None]
    keeper_score = jnp.where(can, scores[None, :], -jnp.inf)
    group = jnp.argmax(keeper_score, axis=1).astype(jnp.int32)
    has = jnp.any(can, axis=1)
    return jnp.where(valid & has, group, -1)


def soft_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
             iou_threshold: float = 0.3, sigma: float = 0.5,
             min_score: float = 1e-3, method: str = 'gaussian',
             max_out: Optional[int] = None,
             valid: Optional[jnp.ndarray] = None) -> NMSResult:
    """Soft-NMS (reference: mmcv.ops.soft_nms; arXiv:1704.04503) —
    greedy selection with score decay instead of hard suppression.

    Sequential by nature: a ``lax.scan`` of N steps (argmax + one IoU
    row + decay each) — O(N²) VPU work, fine at the N≤1000 this is used
    for (CornerNet decode, cascade soft-NMS test configs).

    Returns NMSResult(dets (N,5) in selection order, valid) where valid
    marks selections whose decayed score stayed above ``min_score``.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    sc = jnp.where(valid, scores.astype(jnp.float32), -jnp.inf)
    bx = boxes.astype(jnp.float32)

    area = jnp.maximum(bx[:, 2] - bx[:, 0], 0) * \
        jnp.maximum(bx[:, 3] - bx[:, 1], 0)

    def step(carry, _):
        cur, done = carry
        i = jnp.argmax(jnp.where(done, -jnp.inf, cur))
        s_i = cur[i]
        b = bx[i]
        ix1 = jnp.maximum(bx[:, 0], b[0])
        iy1 = jnp.maximum(bx[:, 1], b[1])
        ix2 = jnp.minimum(bx[:, 2], b[2])
        iy2 = jnp.minimum(bx[:, 3], b[3])
        inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
        iou = inter / jnp.maximum(area + area[i] - inter, 1e-6)
        if method == 'linear':
            decay = jnp.where(iou > iou_threshold, 1.0 - iou, 1.0)
        else:
            decay = jnp.exp(-(iou * iou) / sigma)
        mark = jnp.arange(n) == i
        cur = jnp.where(done | mark, cur, cur * decay)
        done = done | mark
        return (cur, done), (i, s_i)

    (_, _), (order, sel_scores) = jax.lax.scan(
        step, (sc, jnp.zeros((n,), bool)), None, length=n)
    k = n if max_out is None else min(max_out, n)
    order = order[:k]
    sel_scores = sel_scores[:k]
    ok = jnp.isfinite(sel_scores) & (sel_scores > min_score)
    sel_scores = jnp.where(jnp.isfinite(sel_scores), sel_scores, -1.0)
    dets = jnp.concatenate(
        [jnp.take(bx, order, axis=0), sel_scores[:, None]], -1)
    return NMSResult(dets=dets, inds=order, valid=ok)


class FastNMSResult(NamedTuple):
    dets: jnp.ndarray     # (max_num, 5)
    labels: jnp.ndarray   # (max_num,)
    coeffs: jnp.ndarray   # (max_num, P)
    valid: jnp.ndarray    # (max_num,)


def fast_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
             coeffs: jnp.ndarray, score_thr: float, iou_thr: float,
             top_k: int, max_num: int,
             valid: Optional[jnp.ndarray] = None) -> FastNMSResult:
    """YOLACT Fast NMS (reference: core/post_processing/bbox_nms.py:96;
    arXiv:1904.02689) — per-class top-k sort, a single triu IoU-max
    matrix, parallel keep decisions. Already pure matrix ops, so the
    TPU port is direct; fixed ``max_num`` output slots + validity.

    boxes (N, 4), scores (N, C+1) (last col background, ignored),
    coeffs (N, P)."""
    n, c1 = scores.shape
    c = c1 - 1
    sc = scores[:, :-1].T                               # (C, N)
    if valid is not None:
        sc = jnp.where(valid[None, :], sc, -1.0)
    k = min(top_k, n)
    sc_k, idx = jax.lax.top_k(sc, k)                    # (C, k)
    bx = jnp.take(boxes, idx.reshape(-1), axis=0).reshape(c, k, 4)
    cf = jnp.take(coeffs, idx.reshape(-1), axis=0).reshape(
        c, k, coeffs.shape[-1])
    # per-class (k, k) IoU:
    def cls_iou(b):
        x1 = jnp.maximum(b[:, None, 0], b[None, :, 0])
        y1 = jnp.maximum(b[:, None, 1], b[None, :, 1])
        x2 = jnp.minimum(b[:, None, 2], b[None, :, 2])
        y2 = jnp.minimum(b[:, None, 3], b[None, :, 3])
        inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
        a = jnp.maximum(b[:, 2] - b[:, 0], 0) * \
            jnp.maximum(b[:, 3] - b[:, 1], 0)
        return inter / jnp.maximum(a[:, None] + a[None, :] - inter,
                                   1e-6)
    iou = jax.vmap(cls_iou)(bx)                         # (C, k, k)
    iou = jnp.triu(iou, k=1)
    iou_max = iou.max(axis=1)                           # (C, k)
    keep = (iou_max <= iou_thr) & (sc_k > score_thr)

    flat_scores = jnp.where(keep, sc_k, -1.0).reshape(-1)
    m = min(max_num, flat_scores.shape[0])
    top_s, top_i = jax.lax.top_k(flat_scores, m)
    out_boxes = bx.reshape(-1, 4)[top_i]
    out_coeffs = cf.reshape(-1, cf.shape[-1])[top_i]
    out_labels = (top_i // k).astype(jnp.int32)
    ok = top_s > -0.5
    dets = jnp.concatenate([out_boxes, top_s[:, None]], -1)
    return FastNMSResult(dets=dets, labels=out_labels,
                         coeffs=out_coeffs, valid=ok)
