"""Quantify the bitmap-early polygon pipeline divergence (VERDICT r3
ask #8).

The reference keeps polygon annotations as PolygonMasks through the
transforms and rasterizes LATE, at the 28x28 target resolution
(mmdet/core/mask/structures.py:524 crop_and_resize -> polygon crop +
rescale + rasterize). This framework rasterizes polygons to full-res
bitmaps at load time (core/masks.poly2mask) and crops mask targets from
the bitmap with the separable RoIAlign (bitmap-early — sound static-
shape TPU design, but a training-numerics deviation for the ~30
*_poly_* config variants).

This test measures that deviation on synthetic polygons: per-instance
IoU between the reference's late-rasterized 28x28 targets and ours. The
measured bound is asserted and documented in GAPS.md.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')

H, W = 160, 224


def _star_polygon(rs, cx, cy, rmax):
    k = rs.randint(5, 10)
    ang = np.sort(rs.rand(k) * 2 * np.pi)
    rad = rmax * (0.4 + 0.6 * rs.rand(k))
    xs = cx + rad * np.cos(ang)
    ys = cy + rad * np.sin(ang)
    pts = np.stack([xs, ys], -1).reshape(-1)
    return np.clip(pts, 0, [W - 1, H - 1] * k).astype(np.float64)


def _iou(a, b):
    a = a.astype(bool)
    b = b.astype(bool)
    u = np.logical_or(a, b).sum()
    return 1.0 if u == 0 else np.logical_and(a, b).sum() / u


def test_bitmap_early_vs_polygonmasks_targets():
    import torch
    refbridge.install()
    from mmdet.core.mask.structures import PolygonMasks
    from swindet_tpu.core.masks import poly2mask
    from swindet_tpu.models.roi_heads.mask_heads import FCNMaskHead

    rs = np.random.RandomState(0)
    n = 40
    polys, boxes = [], []
    for _ in range(n):
        cx = rs.uniform(40, W - 40)
        cy = rs.uniform(40, H - 40)
        poly = _star_polygon(rs, cx, cy, rs.uniform(12, 36))
        polys.append([poly])
        xs, ys = poly[0::2], poly[1::2]
        # proposal box = polygon bbox jittered like a sampled positive
        bx = np.array([xs.min(), ys.min(), xs.max(), ys.max()])
        jit = rs.uniform(-4, 4, 4)
        boxes.append(np.clip(bx + jit, 0, [W - 1, H - 1, W - 1, H - 1]))
    boxes = np.asarray(boxes, np.float32)

    pm = PolygonMasks(polys, H, W)
    ref = pm.crop_and_resize(
        boxes.astype(np.float64), (28, 28),
        np.arange(n), 'cpu').to_ndarray()

    bitmaps = np.stack([poly2mask(p, H, W) for p in polys]).astype(
        np.float32)
    ours = FCNMaskHead.get_targets(
        jnp.asarray(bitmaps), jnp.asarray(boxes),
        jnp.arange(n), 28)
    ours = np.asarray(ours)

    ious = np.array([_iou(ref[i], ours[i]) for i in range(n)])
    mean_gap = float(1.0 - ious.mean())
    worst_gap = float(1.0 - ious.min())
    print(f'poly-vs-bitmap 28x28 target gap: mean {mean_gap:.4f}, '
          f'worst {worst_gap:.4f}')
    # measured envelope (mean 0.060 / worst 0.187 on this fixture),
    # documented in GAPS.md — fails loudly if the deviation grows.
    # NOTE the reference's DEFAULT COCO path (LoadAnnotations
    # poly2mask=True) converts polygons to bitmaps at load exactly like
    # us and is bit-parity tested elsewhere; this gap applies only to
    # the explicit poly2mask=False (*_poly_*) config variants.
    assert mean_gap <= 0.08, f'mean IoU gap {mean_gap:.4f}'
    assert worst_gap <= 0.25, f'worst IoU gap {worst_gap:.4f}'
