"""Anchor/prior generator parity vs the reference torch generators
(core/anchor/anchor_generator.py): grid anchors and valid flags for
the standard, SSD, YOLO, and Legacy variants, plus MlvlPointGenerator
-style point grids (point_generator.py)."""
import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')

SIZES = [(12, 16), (6, 8), (3, 4)]


def _cmp(ours_lvls, ref_lvls, atol=1e-4):
    assert len(ours_lvls) == len(ref_lvls)
    for lvl, (o, r) in enumerate(zip(ours_lvls, ref_lvls)):
        np.testing.assert_allclose(np.asarray(o, np.float32),
                                   r.numpy().astype(np.float32),
                                   atol=atol, err_msg=f'lvl{lvl}')


def test_standard_anchor_parity():
    refbridge.install()
    from mmdet.core import build_anchor_generator as ref_build
    from swindet_tpu.models.builder import build_anchor_generator

    cfg = dict(type='AnchorGenerator', octave_base_scale=4,
               scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
               strides=[8, 16, 32])
    ref = ref_build(dict(cfg))
    ours = build_anchor_generator(dict(cfg))
    _cmp(ours.grid_anchors(SIZES), ref.grid_anchors(SIZES, device='cpu'))
    # valid flags on a padded canvas smaller than the grid cover
    _cmp([f.astype(np.int32) for f in
          ours.valid_flags(SIZES, (90, 120))],
         [f.int() for f in ref.valid_flags(SIZES, (90, 120), device='cpu')], atol=0)


def test_ssd_anchor_parity():
    refbridge.install()
    from mmdet.core import build_anchor_generator as ref_build
    from swindet_tpu.models.builder import build_anchor_generator

    cfg = dict(type='SSDAnchorGenerator', scale_major=False,
               input_size=300, basesize_ratio_range=(0.15, 0.9),
               strides=[8, 16, 32, 64, 100, 300],
               ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]])
    sizes = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    ref = ref_build(dict(cfg))
    ours = build_anchor_generator(dict(cfg))
    _cmp(ours.grid_anchors(sizes), ref.grid_anchors(sizes, device='cpu'))


def test_yolo_anchor_parity():
    refbridge.install()
    from mmdet.core import build_anchor_generator as ref_build
    from swindet_tpu.models.builder import build_anchor_generator

    cfg = dict(type='YOLOAnchorGenerator',
               base_sizes=[[(116, 90), (156, 198), (373, 326)],
                           [(30, 61), (62, 45), (59, 119)],
                           [(10, 13), (16, 30), (33, 23)]],
               strides=[32, 16, 8])
    sizes = [(10, 13), (20, 26), (40, 52)]
    ref = ref_build(dict(cfg))
    ours = build_anchor_generator(dict(cfg))
    _cmp(ours.grid_anchors(sizes), ref.grid_anchors(sizes, device='cpu'))


def test_legacy_anchor_parity():
    refbridge.install()
    from mmdet.core import build_anchor_generator as ref_build
    from swindet_tpu.models.builder import build_anchor_generator

    cfg = dict(type='LegacyAnchorGenerator', center_offset=0.5,
               scales=[8], ratios=[0.5, 1.0, 2.0], strides=[4, 8])
    ref = ref_build(dict(cfg))
    ours = build_anchor_generator(dict(cfg))
    _cmp(ours.grid_anchors(SIZES[:2]), ref.grid_anchors(SIZES[:2], device='cpu'))


def test_legacy_ssd_anchor_parity():
    refbridge.install()
    from mmdet.core import build_anchor_generator as ref_build
    from swindet_tpu.models.builder import build_anchor_generator

    cfg = dict(type='LegacySSDAnchorGenerator', scale_major=False,
               input_size=300, basesize_ratio_range=(0.15, 0.9),
               strides=[8, 16, 32, 64, 100, 300],
               ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]])
    sizes = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    ref = ref_build(dict(cfg))
    ours = build_anchor_generator(dict(cfg))
    _cmp(ours.grid_anchors(sizes), ref.grid_anchors(sizes, device='cpu'))
