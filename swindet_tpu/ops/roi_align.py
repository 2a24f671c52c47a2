"""RoIAlign — TPU-native multilevel gather implementation.

Replaces mmcv's CUDA RoIAlign (reference: roi extractor cfg
``dict(type='RoIAlign', output_size=7, sampling_ratio=0)`` in
configs/_base_/models/mask_rcnn_swin_fpn.py:46,65; level routing in
mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py:32-51).

TPU-first design decisions:
- All FPN levels are flattened and concatenated once into (B, ΣHW, C);
  each RoI gathers from its assigned level via flat indices — exact
  single-level cost, no per-level masked passes, no dead-level grad hack
  (the reference's single_level_roi_extractor.py:99-107 workaround is
  structurally unnecessary under jit).
- ``aligned=True`` semantics (half-pixel offset) matching mmcv.
- ``sampling_ratio=0`` (adaptive grid) is data-dependent and cannot be
  static under jit; we use a fixed sampling grid (default 2, the
  detectron2-style choice) — the established accuracy-neutral
  approximation (<0.1 mAP in practice).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def map_roi_levels(rois: jnp.ndarray, num_levels: int,
                   finest_scale: int = 56) -> jnp.ndarray:
    """FPN level per RoI: floor(log2(sqrt(area)/finest_scale + 1e-6)),
    clamped (reference: single_level_roi_extractor.py:32-51)."""
    scale = jnp.sqrt((rois[:, 3] - rois[:, 1]) * (rois[:, 4] - rois[:, 2]))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def _bilinear_flat_gather(feat_flat: jnp.ndarray, y: jnp.ndarray,
                          x: jnp.ndarray, h: jnp.ndarray, w: jnp.ndarray,
                          offset: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample points from a flattened (ΣHW, C) map.

    y, x: (...,) sample coords in level space; h, w, offset: broadcastable
    level geometry. mmcv border semantics: samples with y < -1 or y > H
    contribute 0; coords in [-1, 0] clamp to 0 (mirrored at the far edge).
    """
    valid = (y >= -1.0) & (y <= h) & (x >= -1.0) & (x <= w)
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    ly = y - y0
    lx = x - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    def flat(yy, xx):
        idx = (offset + yy * w + xx).astype(jnp.int32)
        return jnp.take(feat_flat, idx, axis=0)

    v00 = flat(y0, x0)
    v01 = flat(y0, x1)
    v10 = flat(y1, x0)
    v11 = flat(y1, x1)
    out = (v00 * (hy * hx)[..., None] + v01 * (hy * lx)[..., None] +
           v10 * (ly * hx)[..., None] + v11 * (ly * lx)[..., None])
    return jnp.where(valid[..., None], out, 0.0)


def multilevel_roi_align(feats: Sequence[jnp.ndarray],
                         rois: jnp.ndarray,
                         strides: Sequence[int],
                         out_size: int,
                         sampling_ratio: int = 2,
                         finest_scale: int = 56,
                         roi_valid: jnp.ndarray = None) -> jnp.ndarray:
    """RoIAlign over FPN levels.

    Args:
        feats: list of (B, H_l, W_l, C) NHWC maps (static shapes).
        rois: (R, 5) — [batch_idx, x1, y1, x2, y2] in image coords.
        strides: per-level feature strides, e.g. (4, 8, 16, 32).
        out_size: output resolution (7 for bbox head, 14 for mask head).
        sampling_ratio: fixed samples per bin per axis.
    Returns:
        (R, out_size, out_size, C)
    """
    num_levels = len(feats)
    b = feats[0].shape[0]
    c = feats[0].shape[-1]
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    offsets = np.cumsum([0] + [h * w for h, w in shapes])[:-1]

    feat_flat = jnp.concatenate(
        [f.reshape(b, -1, c) for f in feats], axis=1)   # (B, ΣHW, C)
    total = feat_flat.shape[1]
    # flatten batch too: index = batch * total + level_offset + y*W + x
    feat_flat = feat_flat.reshape(b * total, c)

    lvl = map_roi_levels(rois, num_levels, finest_scale)   # (R,)
    lvl_h = jnp.asarray([s[0] for s in shapes], jnp.float32)[lvl]
    lvl_w = jnp.asarray([s[1] for s in shapes], jnp.float32)[lvl]
    lvl_off = jnp.asarray(offsets, jnp.float32)[lvl]
    scale = 1.0 / jnp.asarray(strides, jnp.float32)[lvl]

    batch_idx = rois[:, 0].astype(jnp.float32)
    base = batch_idx * float(total) + lvl_off              # (R,)

    # aligned=True: half-pixel offset
    x1 = rois[:, 1] * scale - 0.5
    y1 = rois[:, 2] * scale - 0.5
    x2 = rois[:, 3] * scale - 0.5
    y2 = rois[:, 4] * scale - 0.5
    roi_w = x2 - x1
    roi_h = y2 - y1
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    r = sampling_ratio
    # sample positions: bin index + centered sub-sample offsets
    steps = (np.arange(out_size)[:, None] +
             (np.arange(r)[None, :] + 0.5) / r)            # (out, r)
    ys = y1[:, None, None] + steps[None] * bin_h[:, None, None]  # (R,out,r)
    xs = x1[:, None, None] + steps[None] * bin_w[:, None, None]

    ys = ys.reshape(-1, out_size * r)                       # (R, P)
    xs = xs.reshape(-1, out_size * r)
    # full 2-D sample grid (R, P, P)
    yy = ys[:, :, None]
    xx = xs[:, None, :]
    yy, xx = jnp.broadcast_arrays(yy, xx)

    vals = _bilinear_flat_gather(
        feat_flat, yy, xx,
        lvl_h[:, None, None], lvl_w[:, None, None],
        base[:, None, None])                                # (R, P, P, C)

    # average r×r samples per bin
    rp = out_size * r
    vals = vals.reshape(-1, out_size, r, out_size, r, c)
    out = jnp.mean(vals, axis=(2, 4))
    if roi_valid is not None:
        out = jnp.where(roi_valid[:, None, None, None], out, 0.0)
    return out


def roi_align_single(feat: jnp.ndarray, rois: jnp.ndarray,
                     spatial_scale: float, out_size: int,
                     sampling_ratio: int = 2) -> jnp.ndarray:
    """Single-level RoIAlign on (B, H, W, C); rois (R, 5) with batch col.
    Used for mask-target cropping (reference: core/mask/structures.py:328
    crop_and_resize via mmcv roi_align)."""
    return multilevel_roi_align(
        [feat], rois, [int(round(1.0 / spatial_scale))], out_size,
        sampling_ratio)
