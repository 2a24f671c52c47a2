"""Deformable RoI pooling — TPU-native gather implementation.

Replaces mmcv's ``deform_roi_pool`` CUDA op, consumed by the reference
through ``roi_layer=dict(type='DeformRoIPoolPack'|'ModulatedDeformRoIPoolPack')``
in ``configs/dcn/faster_rcnn_r50_fpn_{dpool,mdpool}_1x_coco.py``.

Semantics (mmcv deform_roi_pool kernel): identical to aligned RoIAlign
average pooling, except every bin ``(ph, pw)``'s sampling window is
translated by a learned per-RoI per-bin offset, scaled by
``gamma * roi_extent`` in feature-map units:

    roi_start += gamma * (roi_w, roi_h) * offset[n, :, ph, pw]

TPU-first design: same flattened multilevel gather as
``ops/roi_align.py`` (one concat of all FPN levels, flat bilinear
gathers, static shapes); the per-bin offset breaks the separable y/x
grid so the full (R, out, out, g, g) sample lattice is materialised —
acceptable because the op only runs on 7x7 bbox extraction for the
dpool config family.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from .roi_align import (SR0_GMAX, _bilinear_flat_gather, adaptive_grid,
                        map_roi_levels)


def multilevel_deform_roi_pool(feats: Sequence[jnp.ndarray],
                               rois: jnp.ndarray,
                               offset: jnp.ndarray,
                               strides: Sequence[int],
                               out_size: int,
                               sampling_ratio: int = 0,
                               gamma: float = 0.1,
                               finest_scale: int = 56,
                               roi_valid: jnp.ndarray = None) -> jnp.ndarray:
    """Deformable RoI pool over FPN levels.

    Args:
        feats: list of (B, H_l, W_l, C) NHWC maps.
        rois: (R, 5) [batch_idx, x1, y1, x2, y2] in image coords.
        offset: (R, out_size, out_size, 2) per-bin (dx, dy) in units of
            gamma * roi extent (mmcv layout is (R, 2, H, W); callers
            pass channel-last).
        strides: per-level feature strides.
        out_size: pooled resolution.
        sampling_ratio: samples/bin/axis; 0 = mmcv adaptive (capped).
        gamma: offset scale (mmcv default 0.1).
    Returns:
        (R, out_size, out_size, C)
    """
    num_levels = len(feats)
    b = feats[0].shape[0]
    c = feats[0].shape[-1]
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    offs = np.cumsum([0] + [h * w for h, w in shapes])[:-1]

    feat_flat = jnp.concatenate(
        [f.reshape(b, -1, c) for f in feats], axis=1)
    total = feat_flat.shape[1]
    feat_flat = feat_flat.reshape(b * total, c)

    lvl = map_roi_levels(rois, num_levels, finest_scale)
    lvl_h = jnp.asarray([s[0] for s in shapes], jnp.float32)[lvl]
    lvl_w = jnp.asarray([s[1] for s in shapes], jnp.float32)[lvl]
    lvl_off = jnp.asarray(offs, jnp.float32)[lvl]
    scale = 1.0 / jnp.asarray(strides, jnp.float32)[lvl]

    base = rois[:, 0].astype(jnp.float32) * float(total) + lvl_off

    x1 = rois[:, 1] * scale - 0.5
    y1 = rois[:, 2] * scale - 0.5
    roi_w = rois[:, 3] * scale - 0.5 - x1
    roi_h = rois[:, 4] * scale - 0.5 - y1
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    n_rois = rois.shape[0]
    if sampling_ratio > 0:
        g = sampling_ratio
        sub = jnp.broadcast_to(
            (jnp.arange(g, dtype=jnp.float32) + 0.5) / g, (n_rois, g))
        sub_y = sub_x = sub
        w_y = w_x = jnp.full((n_rois, g), 1.0 / g)
    else:
        g = SR0_GMAX
        sub_y, w_y, _ = adaptive_grid(roi_h, out_size, g)
        sub_x, w_x, _ = adaptive_grid(roi_w, out_size, g)

    # per-bin deformation in feature units (mmcv: gamma * roi_extent *
    # offset, applied to the bin's start corner — i.e. every sample in
    # the bin translates together)
    off_x = gamma * roi_w[:, None, None] * offset[..., 0]   # (R, out, out)
    off_y = gamma * roi_h[:, None, None] * offset[..., 1]

    bins = jnp.arange(out_size, dtype=jnp.float32)
    # (R, out_ph, out_pw, g_y, g_x) sample lattice
    yy = (y1[:, None, None, None, None] +
          (bins[None, :, None, None, None] +
           sub_y[:, None, None, :, None]) * bin_h[:, None, None, None, None] +
          off_y[..., None, None])
    xx = (x1[:, None, None, None, None] +
          (bins[None, None, :, None, None] +
           sub_x[:, None, None, None, :]) * bin_w[:, None, None, None, None] +
          off_x[..., None, None])
    yy, xx = jnp.broadcast_arrays(yy, xx)

    vals = _bilinear_flat_gather(
        feat_flat, yy, xx,
        lvl_h[:, None, None, None, None], lvl_w[:, None, None, None, None],
        base[:, None, None, None, None])        # (R, out, out, g, g, C)

    w = w_y[:, None, None, :, None] * w_x[:, None, None, None, :]
    out = jnp.sum(vals * w[..., None], axis=(3, 4))
    if roi_valid is not None:
        out = jnp.where(roi_valid[:, None, None, None], out, 0.0)
    return out
