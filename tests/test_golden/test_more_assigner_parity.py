"""Assigner parity vs reference torch implementations:
CenterRegionAssigner (center_region_assigner.py, FSAF),
PointAssigner (point_assigner.py, RepPoints), ApproxMaxIoUAssigner
(approx_max_iou_assigner.py, GuidedAnchor). Complements the
MaxIoU/ATSS/Grid/Hungarian/Region parity suites."""
import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')


def _boxes(rs, n, span=100, wmax=50):
    xy = rs.rand(n, 2).astype(np.float32) * span
    wh = rs.rand(n, 2).astype(np.float32) * wmax + 6
    return np.concatenate([xy, xy + wh], -1)


@pytest.mark.parametrize('seed', [0, 7])
def test_center_region_assigner_parity(seed):
    import torch
    refbridge.install()
    from mmdet.core.bbox.assigners.center_region_assigner import \
        CenterRegionAssigner as Ref
    from swindet_tpu.core.bbox.assigners import CenterRegionAssigner

    rs = np.random.RandomState(seed)
    n, g = 60, 5
    bboxes = _boxes(rs, n)
    gts = _boxes(rs, g, wmax=80)
    labels = rs.randint(0, 4, g)

    ref = Ref(pos_scale=0.2, neg_scale=0.2)
    r = ref.assign(torch.tensor(bboxes), torch.tensor(gts),
                   gt_labels=torch.tensor(labels.astype(np.int64)))
    ours = CenterRegionAssigner(pos_scale=0.2, neg_scale=0.2)
    o = ours.assign(jnp.asarray(bboxes), jnp.asarray(gts),
                    jnp.ones(g, bool),
                    jnp.asarray(labels.astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(o.gt_inds),
                                  r.gt_inds.numpy())
    pos = np.asarray(o.gt_inds) > 0
    if pos.any():
        np.testing.assert_array_equal(np.asarray(o.labels)[pos],
                                      r.labels.numpy()[pos])


@pytest.mark.parametrize('seed', [1, 8])
def test_point_assigner_parity(seed):
    import torch
    refbridge.install()
    from mmdet.core.bbox.assigners.point_assigner import \
        PointAssigner as Ref
    from swindet_tpu.core.bbox.assigners import PointAssigner

    rs = np.random.RandomState(seed)
    n, g = 80, 6
    # points: (x, y, stride) with strides from the FPN ladder
    xy = rs.rand(n, 2).astype(np.float32) * 120
    stride = np.random.RandomState(seed + 1).choice(
        [8, 16, 32, 64], n).astype(np.float32)
    points = np.concatenate([xy, stride[:, None]], -1)
    gts = _boxes(rs, g, wmax=120)
    labels = rs.randint(0, 4, g)

    ref = Ref(scale=4, pos_num=3)
    r = ref.assign(torch.tensor(points), torch.tensor(gts),
                   gt_labels=torch.tensor(labels.astype(np.int64)))
    ours = PointAssigner(scale=4, pos_num=3)
    o = ours.assign(jnp.asarray(points), jnp.asarray(gts),
                    jnp.ones(g, bool),
                    jnp.asarray(labels.astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(o.gt_inds),
                                  r.gt_inds.numpy())


@pytest.mark.parametrize('seed', [2])
def test_approx_max_iou_assigner_parity(seed):
    import torch
    refbridge.install()
    from mmdet.core.bbox.assigners.approx_max_iou_assigner import \
        ApproxMaxIoUAssigner as Ref
    from swindet_tpu.core.bbox.assigners import ApproxMaxIoUAssigner

    rs = np.random.RandomState(seed)
    squares, g, k = 30, 4, 3       # k approxs per square
    sq = _boxes(rs, squares)
    approxs = np.repeat(sq, k, axis=0) + \
        rs.randn(squares * k, 4).astype(np.float32) * 4
    gts = _boxes(rs, g, wmax=70)
    labels = rs.randint(0, 4, g)

    ref = Ref(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.4,
              ignore_iof_thr=-1)
    r = ref.assign(torch.tensor(approxs), torch.tensor(sq), k,
                   torch.tensor(gts),
                   gt_labels=torch.tensor(labels.astype(np.int64)))
    ours = ApproxMaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                                min_pos_iou=0.4, ignore_iof_thr=-1)
    o = ours.assign(jnp.asarray(sq), jnp.asarray(gts),
                    jnp.ones(g, bool),
                    jnp.asarray(labels.astype(np.int32)),
                    approxs=jnp.asarray(approxs),
                    approxs_per_octave=k)
    np.testing.assert_array_equal(np.asarray(o.gt_inds),
                                  r.gt_inds.numpy())
