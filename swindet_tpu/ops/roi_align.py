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
- ``sampling_ratio=0`` (adaptive grid ``ceil(roi_extent/out_size)`` per
  RoI per axis, mmcv semantics) is implemented as a static grid of
  ``SR0_GMAX`` sample slots with per-RoI data-dependent positions and
  masked 1/g weights — exact whenever the adaptive count ≤ SR0_GMAX
  (all COCO-scale rois at their routed FPN level except aspect ≳ 5
  outliers, which fall back to a capped-count subsample average).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# static sample-slot budget for sampling_ratio=0 (adaptive) — the
# per-axis adaptive count is clamped to this many slots
SR0_GMAX = 8


def adaptive_grid(extent: jnp.ndarray, out_size: int, g_max: int):
    """Per-RoI adaptive sample count/positions/weights for one axis.

    mmcv: ``g = max(ceil(roi_extent / out_size), 1)`` samples per bin at
    positions ``(k + 0.5) / g``, averaged with weight ``1/g``. Returns
    (steps, weights, count): steps (R, g_max) in-bin offsets, weights
    (R, g_max) — 0 for the unused slots — and count (R,) float.
    """
    g = jnp.clip(jnp.ceil(extent / out_size), 1, g_max)      # (R,) float
    k = jnp.arange(g_max, dtype=extent.dtype)
    steps = (k[None, :] + 0.5) / g[:, None]                  # (R, g_max)
    weights = jnp.where(k[None, :] < g[:, None], 1.0 / g[:, None], 0.0)
    return steps, weights, g


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
                         sampling_ratio: int = 0,
                         finest_scale: int = 56,
                         roi_valid: jnp.ndarray = None) -> jnp.ndarray:
    """RoIAlign over FPN levels.

    Args:
        feats: list of (B, H_l, W_l, C) NHWC maps (static shapes).
        rois: (R, 5) — [batch_idx, x1, y1, x2, y2] in image coords.
        strides: per-level feature strides, e.g. (4, 8, 16, 32).
        out_size: output resolution (7 for bbox head, 14 for mask head).
        sampling_ratio: samples per bin per axis; 0 = mmcv adaptive
            (per-RoI ceil(extent/out_size), capped at SR0_GMAX).
    Returns:
        (R, out_size, out_size, C)
    """
    # mmcv's roi_align backward produces NO roi-coordinate gradient
    # (input grads only); the Pallas path's custom VJP already matches
    # that, and this XLA formulation must too — otherwise roi-grad
    # behavior is platform-dependent and Sparse R-CNN's learnable init
    # proposals train differently (caught by test_grad_parity_sparse_rcnn)
    rois = jax.lax.stop_gradient(rois)
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

    n_rois = rois.shape[0]
    if sampling_ratio > 0:
        r = sampling_ratio
        sub_y = jnp.broadcast_to(
            (jnp.arange(r, dtype=jnp.float32) + 0.5) / r, (n_rois, r))
        sub_x = sub_y
        w_y = jnp.full((n_rois, r), 1.0 / r)
        w_x = w_y
    else:
        r = SR0_GMAX
        sub_y, w_y, _ = adaptive_grid(roi_h, out_size, r)
        sub_x, w_x, _ = adaptive_grid(roi_w, out_size, r)

    # sample positions: bin index + per-RoI sub-sample offsets
    bins = jnp.arange(out_size, dtype=jnp.float32)          # (out,)
    ys = (y1[:, None, None] +
          (bins[None, :, None] + sub_y[:, None, :]) * bin_h[:, None, None])
    xs = (x1[:, None, None] +
          (bins[None, :, None] + sub_x[:, None, :]) * bin_w[:, None, None])

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

    # weighted average of the r×r sample slots per bin (weights encode
    # the adaptive per-RoI counts; uniform 1/r for fixed ratios)
    vals = vals.reshape(-1, out_size, r, out_size, r, c)
    w = (w_y[:, None, :, None, None] * w_x[:, None, None, None, :])
    out = jnp.sum(vals * w[..., None], axis=(2, 4))
    if roi_valid is not None:
        out = jnp.where(roi_valid[:, None, None, None], out, 0.0)
    return out


def roi_align_single(feat: jnp.ndarray, rois: jnp.ndarray,
                     spatial_scale: float, out_size: int,
                     sampling_ratio: int = 0) -> jnp.ndarray:
    """Single-level RoIAlign on (B, H, W, C); rois (R, 5) with batch col.
    Used for mask-target cropping (reference: core/mask/structures.py:328
    crop_and_resize via mmcv roi_align)."""
    return multilevel_roi_align(
        [feat], rois, [int(round(1.0 / spatial_scale))], out_size,
        sampling_ratio)
