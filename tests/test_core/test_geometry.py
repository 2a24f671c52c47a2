"""Geometry-core unit tests: IoU, coders, anchors — checked against
independent numpy implementations and reference golden values
(reference test model: tests/test_utils/test_anchor.py etc.)."""
import numpy as np
import jax.numpy as jnp
import pytest

from swindet_tpu.core import (AnchorGenerator, bbox_overlaps, bbox2delta,
                              delta2bbox, distance2bbox)
from swindet_tpu.core.bbox.transforms import (bbox2roi, bbox2result,
                                              bbox_flip)


def np_iou(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-6)


class TestIoU:
    def test_vs_numpy(self, rng):
        a = rng.rand(20, 4) * 100
        a[:, 2:] += a[:, :2]
        b = rng.rand(30, 4) * 100
        b[:, 2:] += b[:, :2]
        got = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, np_iou(a, b), rtol=1e-5, atol=1e-6)

    def test_known_values(self):
        a = jnp.array([[0., 0., 10., 10.]])
        b = jnp.array([[0., 0., 10., 10.], [5., 5., 15., 15.],
                       [20., 20., 30., 30.]])
        got = np.asarray(bbox_overlaps(a, b))[0]
        np.testing.assert_allclose(got, [1.0, 25. / 175., 0.0], rtol=1e-5)

    def test_iof(self):
        a = jnp.array([[0., 0., 10., 10.]])
        b = jnp.array([[0., 0., 5., 10.]])
        got = np.asarray(bbox_overlaps(a, b, mode='iof'))[0, 0]
        assert abs(got - 0.5) < 1e-6

    def test_giou_range(self, rng):
        a = rng.rand(10, 4) * 50
        a[:, 2:] += a[:, :2]
        b = rng.rand(10, 4) * 50
        b[:, 2:] += b[:, :2]
        g = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b),
                                     mode='giou'))
        assert np.all(g >= -1.0 - 1e-6) and np.all(g <= 1.0 + 1e-6)

    def test_aligned(self, rng):
        a = rng.rand(7, 4) * 50
        a[:, 2:] += a[:, :2]
        got = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(a),
                                       is_aligned=True))
        np.testing.assert_allclose(got, np.ones(7), rtol=1e-5)


class TestDeltaCoder:
    def test_roundtrip(self, rng):
        # keep wh ratios within wh_ratio_clip so decode doesn't clip
        props = rng.rand(50, 4) * 100
        props[:, 2:] = props[:, :2] + 10 + rng.rand(50, 2) * 50
        gts = rng.rand(50, 4) * 100
        gts[:, 2:] = gts[:, :2] + 10 + rng.rand(50, 2) * 50
        means, stds = (0.1, 0.2, 0.3, 0.4), (0.5, 1.0, 2.0, 0.7)
        deltas = bbox2delta(jnp.asarray(props), jnp.asarray(gts), means, stds)
        back = delta2bbox(jnp.asarray(props), deltas, means, stds)
        np.testing.assert_allclose(np.asarray(back), gts, rtol=1e-3,
                                   atol=1e-2)

    def test_identity_delta(self):
        rois = jnp.array([[0., 0., 10., 10.]])
        deltas = jnp.zeros((1, 4))
        out = np.asarray(delta2bbox(rois, deltas))
        np.testing.assert_allclose(out, [[0., 0., 10., 10.]], atol=1e-5)

    def test_clip_border(self):
        rois = jnp.array([[0., 0., 10., 10.]])
        deltas = jnp.array([[5., 5., 0., 0.]])
        out = np.asarray(delta2bbox(rois, deltas, max_shape=(20, 30)))
        assert out[0, 2] <= 30 and out[0, 3] <= 20

    def test_multi_class_deltas(self, rng):
        rois = jnp.asarray([[0., 0., 10., 10.], [5., 5., 20., 25.]])
        deltas = jnp.asarray(rng.randn(2, 12).astype(np.float32) * 0.1)
        out = delta2bbox(rois, deltas)
        assert out.shape == (2, 12)
        # each class-group decodes independently
        one = delta2bbox(rois, deltas[:, 4:8])
        np.testing.assert_allclose(np.asarray(out[:, 4:8]), np.asarray(one),
                                   rtol=1e-5)


class TestDistance2BBox:
    def test_basic(self):
        points = jnp.array([[10., 10.]])
        dist = jnp.array([[2., 3., 4., 5.]])
        out = np.asarray(distance2bbox(points, dist))
        np.testing.assert_allclose(out, [[8., 7., 14., 15.]])


class TestAnchorGenerator:
    def test_base_anchor_golden(self):
        # Golden values matching the reference AnchorGenerator semantics
        # (mmdet/core/anchor/anchor_generator.py, center_offset=0):
        # stride 4, scale 8, ratio 1.0 → 32x32 box centred at origin.
        gen = AnchorGenerator(strides=[4], ratios=[1.0], scales=[8])
        base = gen.base_anchors[0]
        np.testing.assert_allclose(base, [[-16., -16., 16., 16.]], atol=1e-4)

    def test_ratio_areas(self):
        gen = AnchorGenerator(strides=[16], ratios=[0.5, 1.0, 2.0],
                              scales=[8])
        base = gen.base_anchors[0]
        areas = (base[:, 2] - base[:, 0]) * (base[:, 3] - base[:, 1])
        np.testing.assert_allclose(areas, [128 * 128] * 3, rtol=1e-5)
        hw = (base[:, 3] - base[:, 1]) / (base[:, 2] - base[:, 0])
        np.testing.assert_allclose(hw, [0.5, 1.0, 2.0], rtol=1e-5)

    def test_grid_shift(self):
        gen = AnchorGenerator(strides=[4], ratios=[1.0], scales=[8])
        anchors = gen.grid_anchors([(2, 3)])[0]
        assert anchors.shape == (6, 4)
        np.testing.assert_allclose(np.asarray(anchors[1] - anchors[0]),
                                   [4., 0., 4., 0.])
        np.testing.assert_allclose(np.asarray(anchors[3] - anchors[0]),
                                   [0., 4., 0., 4.])

    def test_valid_flags(self):
        gen = AnchorGenerator(strides=[4], ratios=[1.0], scales=[8])
        flags = gen.valid_flags([(4, 4)], (9, 9))[0]
        # ceil(9/4) = 3 valid rows/cols of 4
        got = np.asarray(flags).reshape(4, 4)
        assert got[:3, :3].all() and not got[3].any() and not got[:, 3].any()

    def test_octave_scales(self):
        gen = AnchorGenerator(strides=[8], ratios=[1.0], octave_base_scale=4,
                              scales_per_octave=3)
        assert gen.base_anchors[0].shape == (3, 4)


class TestTransforms:
    def test_bbox_flip_horizontal(self):
        b = jnp.array([[10., 20., 30., 40.]])
        out = np.asarray(bbox_flip(b, (100, 200)))
        np.testing.assert_allclose(out, [[170., 20., 190., 40.]])

    def test_bbox2roi(self):
        b0 = jnp.ones((2, 4))
        b1 = jnp.zeros((3, 4))
        rois = np.asarray(bbox2roi([b0, b1]))
        assert rois.shape == (5, 5)
        np.testing.assert_allclose(rois[:, 0], [0, 0, 1, 1, 1])

    def test_bbox2result(self):
        boxes = np.array([[0, 0, 1, 1, 0.9], [1, 1, 2, 2, 0.8],
                          [0, 0, 0, 0, 0.0]])
        labels = np.array([2, 0, 0])
        valid = np.array([True, True, False])
        res = bbox2result(boxes, labels, 3, valid)
        assert len(res) == 3
        assert res[0].shape == (1, 5) and res[2].shape == (1, 5)
        assert res[1].shape == (0, 5)
