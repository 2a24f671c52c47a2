"""IoU-balanced / instance-balanced sampler behavior (reference:
iou_balanced_neg_sampler.py, instance_balanced_pos_sampler.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from swindet_tpu.core.bbox.assigners import AssignResult
from swindet_tpu.core.bbox.samplers import (InstanceBalancedPosSampler,
                                            IoUBalancedNegSampler)


def _assign(n, gt_inds, ious):
    return AssignResult(gt_inds=jnp.asarray(gt_inds, jnp.int32),
                        max_overlaps=jnp.asarray(ious, jnp.float32),
                        labels=jnp.where(
                            jnp.asarray(gt_inds) > 0, 0, -1))


def test_iou_balanced_neg_even_bins():
    """Negatives must come evenly from the IoU bins, not the densest."""
    n = 300
    ious = np.zeros(n, np.float32)
    # bin layout over [0, 0.45): 100 low-IoU, 180 mid, 20 high
    ious[:100] = 0.05
    ious[100:280] = 0.2
    ious[280:] = 0.4
    gt_inds = np.zeros(n, np.int64)
    gt_inds[:2] = [1, 2]           # 2 positives (iou below overridden)
    ious[:2] = 0.9
    boxes = jnp.tile(jnp.asarray([[0., 0., 10., 10.]]), (n, 1))
    s = IoUBalancedNegSampler(num=62, pos_fraction=0.04, num_bins=3,
                              add_gt_as_proposals=False)
    res = s.sample(jax.random.PRNGKey(0), _assign(n, gt_inds, ious),
                   boxes, jnp.zeros((2, 4)), jnp.ones((2,), bool),
                   jnp.asarray([0, 1], jnp.int32))
    sel = [int(i) for i, v, p in zip(res.inds, res.valid, res.is_pos)
           if v and not p]
    iou_sel = np.asarray(ious)[sel]
    n_low = int(np.sum(iou_sel < 0.15))
    n_mid = int(np.sum((iou_sel >= 0.15) & (iou_sel < 0.3)))
    n_high = int(np.sum(iou_sel >= 0.3))
    # 60 negatives: even split would be 20/20/20 with the high bin
    # capped at its population (20) — random sampling would put ~36 in
    # the mid bin
    assert n_high == 20
    assert abs(n_low - n_mid) <= 2
    assert n_low + n_mid + n_high == 60


def test_instance_balanced_pos():
    """Positives drawn equally per gt instance."""
    n = 100
    gt_inds = np.zeros(n, np.int64)
    gt_inds[:40] = 1               # gt 1 owns 40 anchors
    gt_inds[40:44] = 2             # gt 2 owns 4
    ious = np.where(gt_inds > 0, 0.9, 0.1).astype(np.float32)
    boxes = jnp.tile(jnp.asarray([[0., 0., 10., 10.]]), (n, 1))
    s = InstanceBalancedPosSampler(num=16, pos_fraction=0.5,
                                   add_gt_as_proposals=False)
    res = s.sample(jax.random.PRNGKey(0), _assign(n, gt_inds, ious),
                   boxes, jnp.zeros((2, 4)), jnp.ones((2,), bool),
                   jnp.asarray([0, 1], jnp.int32))
    sel_gt = [int(g) for g, v, p in zip(
        jnp.take(jnp.asarray(gt_inds), res.inds), res.valid, res.is_pos)
        if v and p]
    # 8 positives: gt2 contributes all 4 of its anchors, gt1 the rest
    assert sel_gt.count(2) == 4
    assert sel_gt.count(1) == 4


def test_nms_match_groups():
    from swindet_tpu.core.nms import nms_match
    dets = jnp.asarray([
        [0, 0, 10, 10, 0.9],     # kept
        [1, 1, 11, 11, 0.8],     # suppressed by 0
        [50, 50, 60, 60, 0.7],   # kept
        [51, 51, 61, 61, 0.6],   # suppressed by 2
        [100, 100, 110, 110, 0.5],  # kept, own group
    ], jnp.float32)
    g = nms_match(dets, 0.5)
    assert [int(v) for v in g] == [0, 0, 2, 2, 4]


def test_point_sample_bilinear():
    import numpy as np
    from swindet_tpu.ops.point_sample import point_sample
    feats = jnp.asarray(np.arange(16, dtype=np.float32)
                        .reshape(1, 4, 4, 1))
    # centre of pixel (1, 2) → exact value 6
    pts = jnp.asarray([[[(2 + 0.5) / 4, (1 + 0.5) / 4],
                        [0.5, 0.5]]])
    out = point_sample(feats, pts)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), 6.0, atol=1e-5)
    # midpoint between pixel centres (1,1),(1,2),(2,1),(2,2): mean = 7.5
    np.testing.assert_allclose(np.asarray(out[0, 1, 0]), 7.5, atol=1e-5)
