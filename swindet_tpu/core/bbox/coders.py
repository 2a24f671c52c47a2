"""Box coders.

TPU-native equivalents of the reference coders
(reference: mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:10,
 bbox2delta:88, delta2bbox:134; distance_point coder).
Pure jnp; shapes static; ``max_shape`` clamping is per-example.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...registries import BBOX_CODERS


def bbox2delta(proposals: jnp.ndarray, gt: jnp.ndarray,
               means: Sequence[float] = (0., 0., 0., 0.),
               stds: Sequence[float] = (1., 1., 1., 1.),
               eps: float = 1e-6) -> jnp.ndarray:
    """Encode gt boxes as (dx, dy, dw, dh) deltas w.r.t. proposals."""
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]

    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]

    pw = jnp.maximum(pw, eps)
    ph = jnp.maximum(ph, eps)
    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(jnp.maximum(gw, eps) / pw)
    dh = jnp.log(jnp.maximum(gh, eps) / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)

    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def delta2bbox(rois: jnp.ndarray, deltas: jnp.ndarray,
               means: Sequence[float] = (0., 0., 0., 0.),
               stds: Sequence[float] = (1., 1., 1., 1.),
               max_shape: Optional[Tuple[int, int]] = None,
               wh_ratio_clip: float = 16 / 1000,
               clip_border: bool = True) -> jnp.ndarray:
    """Decode deltas on top of rois.

    rois: (..., 4); deltas: (..., 4*k) → returns (..., 4*k) boxes.
    ``max_shape`` is (H, W) — either python ints or a traced (2,) array.
    """
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    k = deltas.shape[-1] // 4
    d = deltas.reshape(deltas.shape[:-1] + (k, 4)) * stds + means
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]

    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)

    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0])[..., None]
    ph = (rois[..., 3] - rois[..., 1])[..., None]

    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy

    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    if clip_border and max_shape is not None:
        h, w = max_shape[0], max_shape[1]
        x1 = jnp.clip(x1, 0, w)
        y1 = jnp.clip(y1, 0, h)
        x2 = jnp.clip(x2, 0, w)
        y2 = jnp.clip(y2, 0, h)
    out = jnp.stack([x1, y1, x2, y2], axis=-1)
    return out.reshape(deltas.shape)


def distance2bbox(points: jnp.ndarray, distance: jnp.ndarray,
                  max_shape: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """Decode (left, top, right, bottom) distances from points to a box
    (reference: mmdet/core/bbox/transforms.py distance2bbox)."""
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    if max_shape is not None:
        h, w = max_shape[0], max_shape[1]
        x1 = jnp.clip(x1, 0, w)
        y1 = jnp.clip(y1, 0, h)
        x2 = jnp.clip(x2, 0, w)
        y2 = jnp.clip(y2, 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox2distance(points: jnp.ndarray, bbox: jnp.ndarray,
                  max_dis: Optional[float] = None,
                  eps: float = 0.1) -> jnp.ndarray:
    """Encode a box as distances from a point."""
    left = points[..., 0] - bbox[..., 0]
    top = points[..., 1] - bbox[..., 1]
    right = bbox[..., 2] - points[..., 0]
    bottom = bbox[..., 3] - points[..., 1]
    d = jnp.stack([left, top, right, bottom], axis=-1)
    if max_dis is not None:
        d = jnp.clip(d, 0, max_dis - eps)
    return d


@BBOX_CODERS.register_module()
class DeltaXYWHBBoxCoder:
    """(dx, dy, dw, dh) coder with mean/std normalisation
    (reference: delta_xywh_bbox_coder.py:10)."""

    def __init__(self, target_means=(0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1.),
                 clip_border: bool = True):
        self.means = tuple(target_means)
        self.stds = tuple(target_stds)
        self.clip_border = clip_border

    def encode(self, bboxes, gt_bboxes):
        return bbox2delta(bboxes, gt_bboxes, self.means, self.stds)

    def decode(self, bboxes, pred_bboxes, max_shape=None,
               wh_ratio_clip=16 / 1000):
        return delta2bbox(bboxes, pred_bboxes, self.means, self.stds,
                          max_shape, wh_ratio_clip, self.clip_border)


@BBOX_CODERS.register_module()
class DistancePointBBoxCoder:
    """Point ↔ (l, t, r, b) distance coder (FCOS-style)."""

    def __init__(self, clip_border: bool = True):
        self.clip_border = clip_border

    def encode(self, points, gt_bboxes, max_dis=None, eps=0.1):
        return bbox2distance(points, gt_bboxes, max_dis, eps)

    def decode(self, points, pred, max_shape=None):
        return distance2bbox(points, pred,
                             max_shape if self.clip_border else None)


@BBOX_CODERS.register_module()
class YOLOBBoxCoder:
    """YOLO grid-relative coder (reference: mmdet/core/bbox/coder/
    yolo_bbox_coder.py:9). cx,cy in [0,1] relative to the grid cell;
    dw,dh log-scale wrt the anchor."""

    def __init__(self, eps: float = 1e-6):
        self.eps = eps

    def encode(self, bboxes, gt_bboxes, stride):
        x_c_gt = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
        y_c_gt = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
        w_gt = gt_bboxes[..., 2] - gt_bboxes[..., 0]
        h_gt = gt_bboxes[..., 3] - gt_bboxes[..., 1]
        x_c = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        y_c = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
        w_t = jnp.log(jnp.clip(w_gt / w, self.eps))
        h_t = jnp.log(jnp.clip(h_gt / h, self.eps))
        x_t = jnp.clip((x_c_gt - x_c) / stride + 0.5, self.eps,
                       1 - self.eps)
        y_t = jnp.clip((y_c_gt - y_c) / stride + 0.5, self.eps,
                       1 - self.eps)
        return jnp.stack([x_t, y_t, w_t, h_t], axis=-1)

    def decode(self, bboxes, pred_bboxes, stride):
        x_c = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        y_c = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
        x_cp = (pred_bboxes[..., 0] - 0.5) * stride + x_c
        y_cp = (pred_bboxes[..., 1] - 0.5) * stride + y_c
        w_p = jnp.exp(pred_bboxes[..., 2]) * w
        h_p = jnp.exp(pred_bboxes[..., 3]) * h
        return jnp.stack([x_cp - w_p / 2, y_cp - h_p / 2,
                          x_cp + w_p / 2, y_cp + h_p / 2], axis=-1)


@BBOX_CODERS.register_module()
class TBLRBBoxCoder:
    """(top, bottom, left, right) distances from the prior centre,
    normalized by the prior's h/w and ``normalizer`` (reference:
    mmdet/core/bbox/coder/tblr_bbox_coder.py:9; used by FSAF)."""

    def __init__(self, normalizer=4.0, clip_border: bool = True):
        self.normalizer = normalizer
        self.clip_border = clip_border

    def encode(self, bboxes, gt_bboxes):
        cx = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        cy = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
        top = (cy - gt_bboxes[..., 1]) / h
        bottom = (gt_bboxes[..., 3] - cy) / h
        left = (cx - gt_bboxes[..., 0]) / w
        right = (gt_bboxes[..., 2] - cx) / w
        return jnp.stack([top, bottom, left, right],
                         axis=-1) / self.normalizer

    def decode(self, bboxes, pred_bboxes, max_shape=None):
        loc = pred_bboxes * self.normalizer
        cx = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        cy = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
        top = loc[..., 0] * h
        bottom = loc[..., 1] * h
        left = loc[..., 2] * w
        right = loc[..., 3] * w
        x1, y1 = cx - left, cy - top
        x2, y2 = cx + right, cy + bottom
        if self.clip_border and max_shape is not None:
            hh, ww = max_shape[0], max_shape[1]
            x1 = jnp.clip(x1, 0, ww)
            y1 = jnp.clip(y1, 0, hh)
            x2 = jnp.clip(x2, 0, ww)
            y2 = jnp.clip(y2, 0, hh)
        return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox_rescale(bboxes, scale_factor=1.0):
    """Rescale boxes around their centers (reference:
    core/bbox/transforms.py bbox_rescale)."""
    cx = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
    cy = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
    w = (bboxes[..., 2] - bboxes[..., 0]) * scale_factor
    h = (bboxes[..., 3] - bboxes[..., 1]) * scale_factor
    return jnp.stack([cx - w * 0.5, cy - h * 0.5,
                      cx + w * 0.5, cy + h * 0.5], -1)


@BBOX_CODERS.register_module()
class BucketingBBoxCoder:
    """Side-Aware Boundary Localization coder (reference:
    core/bbox/coder/bucketing_bbox_coder.py:12; SABL arXiv:1912.04260).

    encode → (offsets, offset_weights, bucket_labels, cls_weights),
    each (N, 4*side_num); decode((cls_preds, offset_preds)) →
    (bboxes, loc_confidence). The reference's per-k scatter of offset
    weights becomes a sum of one-hots (top-k labels are distinct)."""

    def __init__(self, num_buckets, scale_factor, offset_topk=2,
                 offset_upperbound=1.0, cls_ignore_neighbor=True,
                 clip_border=True):
        self.num_buckets = num_buckets
        self.scale_factor = scale_factor
        self.offset_topk = offset_topk
        self.offset_upperbound = offset_upperbound
        self.cls_ignore_neighbor = cls_ignore_neighbor
        self.clip_border = clip_border
        self.side_num = int(np.ceil(num_buckets / 2.0))

    def _buckets(self, proposals):
        p = bbox_rescale(proposals, self.scale_factor)
        pw = p[..., 2] - p[..., 0]
        ph = p[..., 3] - p[..., 1]
        bw = pw / self.num_buckets
        bh = ph / self.num_buckets
        steps = (0.5 + jnp.arange(self.side_num, dtype=jnp.float32))
        l = p[..., 0, None] + steps * bw[..., None]
        r = p[..., 2, None] - steps * bw[..., None]
        t = p[..., 1, None] + steps * bh[..., None]
        d = p[..., 3, None] - steps * bh[..., None]
        return bw, bh, l, r, t, d

    def encode(self, bboxes, gt_bboxes):
        bw, bh, l, r, t, d = self._buckets(bboxes.astype(jnp.float32))
        gt = gt_bboxes.astype(jnp.float32)
        bw = jnp.maximum(bw, 1e-6)[..., None]
        bh = jnp.maximum(bh, 1e-6)[..., None]
        offs = [(l - gt[..., 0, None]) / bw,
                (r - gt[..., 2, None]) / bw,
                (t - gt[..., 1, None]) / bh,
                (d - gt[..., 3, None]) / bh]   # each (N, side)

        def side(o):
            k = min(self.offset_topk, self.side_num)
            topk_val, topk_idx = jax.lax.top_k(-jnp.abs(o), k)
            topk_val = -topk_val
            w = jax.nn.one_hot(topk_idx[..., 0], self.side_num)
            for j in range(1, k):
                w = w + jax.nn.one_hot(topk_idx[..., j], self.side_num) \
                    * (topk_val[..., j:j + 1] < self.offset_upperbound)
            lab = jax.nn.one_hot(topk_idx[..., 0], self.side_num)
            cw = (jnp.abs(o) < 1).astype(jnp.float32)
            return w, lab, cw

        ws, labs, cws = zip(*[side(o) for o in offs])
        offsets = jnp.concatenate(offs, -1)
        offset_weights = jnp.concatenate(ws, -1)
        bucket_labels = jnp.concatenate(labs, -1)
        cls_weights = jnp.concatenate(cws, -1)
        if self.cls_ignore_neighbor:
            cls_weights = (~((cls_weights == 1) &
                             (bucket_labels == 0))).astype(jnp.float32)
        else:
            cls_weights = jnp.ones_like(cls_weights)
        return offsets, offset_weights, bucket_labels, cls_weights

    def decode(self, bboxes, pred_bboxes, max_shape=None):
        cls_preds, offset_preds = pred_bboxes
        n = bboxes.shape[0]
        s = self.side_num
        scores = jax.nn.softmax(
            cls_preds.astype(jnp.float32).reshape(n, 4, s), -1)
        top2, lab2 = jax.lax.top_k(scores, 2)               # (N, 4, 2)
        bw, bh, _, _, _, _ = self._buckets(bboxes.astype(jnp.float32))
        p = bbox_rescale(bboxes.astype(jnp.float32), self.scale_factor)
        best = lab2[..., 0].astype(jnp.float32)             # (N, 4)
        l_b = p[:, 0] + (0.5 + best[:, 0]) * bw
        r_b = p[:, 2] - (0.5 + best[:, 1]) * bw
        t_b = p[:, 1] + (0.5 + best[:, 2]) * bh
        d_b = p[:, 3] - (0.5 + best[:, 3]) * bh
        offs = offset_preds.astype(jnp.float32).reshape(n, 4, s)
        sel = jnp.take_along_axis(offs, lab2[..., :1], -1)[..., 0]
        x1 = l_b - sel[:, 0] * bw
        x2 = r_b - sel[:, 1] * bw
        y1 = t_b - sel[:, 2] * bh
        y2 = d_b - sel[:, 3] * bh
        if self.clip_border and max_shape is not None:
            # max_shape entries may be python ints, traced scalars, or
            # per-RoI (N, 1) columns (cascade's regress_by_class) —
            # flatten to (1,)/(N,) so they broadcast against (N,) coords
            hh = jnp.reshape(jnp.asarray(max_shape[0], jnp.float32), (-1,))
            ww = jnp.reshape(jnp.asarray(max_shape[1], jnp.float32), (-1,))
            x1 = jnp.clip(x1, 0, ww - 1)
            y1 = jnp.clip(y1, 0, hh - 1)
            x2 = jnp.clip(x2, 0, ww - 1)
            y2 = jnp.clip(y2, 0, hh - 1)
        out = jnp.stack([x1, y1, x2, y2], -1)
        # bucketing-guided rescoring
        conf = top2[..., 0] + top2[..., 1] * (
            jnp.abs(lab2[..., 0] - lab2[..., 1]) == 1)
        return out, conf.mean(-1)


@BBOX_CODERS.register_module()
class LegacyDeltaXYWHBBoxCoder:
    """MMDet v1.x delta coder (reference: core/bbox/coder/
    legacy_delta_xywh_bbox_coder.py:10) — the +1 width/height
    convention; decode keeps the v2 half-pixel improvement the
    reference adopted (:202-208)."""

    def __init__(self, target_means=(0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1.)):
        self.means = jnp.asarray(target_means, jnp.float32)
        self.stds = jnp.asarray(target_stds, jnp.float32)

    def encode(self, bboxes, gt_bboxes):
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0] + 1.0
        ph = bboxes[..., 3] - bboxes[..., 1] + 1.0
        gx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
        gy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
        gw = gt_bboxes[..., 2] - gt_bboxes[..., 0] + 1.0
        gh = gt_bboxes[..., 3] - gt_bboxes[..., 1] + 1.0
        d = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                       jnp.log(gw / pw), jnp.log(gh / ph)], -1)
        return (d - self.means) / self.stds

    def decode(self, bboxes, pred_bboxes, max_shape=None,
               wh_ratio_clip=16 / 1000):
        k = pred_bboxes.shape[-1] // 4
        d = (pred_bboxes.reshape(pred_bboxes.shape[:-1] + (k, 4))
             * self.stds + self.means)
        max_ratio = float(np.abs(np.log(wh_ratio_clip)))
        dx, dy = d[..., 0], d[..., 1]
        dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
        dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)
        px = ((bboxes[..., 0] + bboxes[..., 2]) * 0.5)[..., None]
        py = ((bboxes[..., 1] + bboxes[..., 3]) * 0.5)[..., None]
        pw = (bboxes[..., 2] - bboxes[..., 0] + 1.0)[..., None]
        ph = (bboxes[..., 3] - bboxes[..., 1] + 1.0)[..., None]
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        gx = px + pw * dx
        gy = py + ph * dy
        x1 = gx - gw * 0.5
        y1 = gy - gh * 0.5
        x2 = gx + gw * 0.5
        y2 = gy + gh * 0.5
        if max_shape is not None:
            hh, ww = max_shape[0], max_shape[1]
            x1 = jnp.clip(x1, 0, ww - 1)
            y1 = jnp.clip(y1, 0, hh - 1)
            x2 = jnp.clip(x2, 0, ww - 1)
            y2 = jnp.clip(y2, 0, hh - 1)
        out = jnp.stack([x1, y1, x2, y2], -1)
        return out.reshape(pred_bboxes.shape)
