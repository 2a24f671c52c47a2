"""Box coders.

TPU-native equivalents of the reference coders
(reference: mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:10,
 bbox2delta:88, delta2bbox:134; distance_point coder).
Pure jnp; shapes static; ``max_shape`` clamping is per-example.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import math

import jax.numpy as jnp

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
