"""Assigner/sampler semantics tests mirroring the reference's
tests/test_utils/test_assigner.py cases (incl. empty-gt) on padded inputs."""
import jax
import numpy as np
import jax.numpy as jnp

from swindet_tpu.core import MaxIoUAssigner, RandomSampler


def pad_gt(gt, g_max):
    g = len(gt)
    out = np.zeros((g_max, 4), np.float32)
    out[:g] = gt
    valid = np.zeros(g_max, bool)
    valid[:g] = True
    return jnp.asarray(out), jnp.asarray(valid)


class TestMaxIoUAssigner:
    def setup_method(self):
        self.assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                       min_pos_iou=0.5)

    def test_basic_assign(self):
        bboxes = jnp.array([
            [0., 0., 10., 10.],       # iou 1.0 with gt0 → pos
            [10., 10., 20., 20.],     # iou 1.0 with gt1 → pos
            [5., 5., 15., 15.],       # low iou with both → neg
            [30., 30., 40., 40.],     # no overlap → neg
        ])
        gt, gv = pad_gt([[0, 0, 10, 10], [10, 10, 20, 20]], 5)
        labels = jnp.array([2, 3, 0, 0, 0], jnp.int32)
        res = self.assigner.assign(bboxes, gt, gv, labels)
        np.testing.assert_array_equal(np.asarray(res.gt_inds), [1, 2, 0, 0])
        np.testing.assert_array_equal(np.asarray(res.labels), [2, 3, -1, -1])

    def test_empty_gt(self):
        bboxes = jnp.array([[0., 0., 10., 10.], [5., 5., 15., 15.]])
        gt, gv = pad_gt(np.zeros((0, 4)), 3)
        res = self.assigner.assign(bboxes, gt, gv)
        # all negative (max overlap vs invalid = -1 → but reference returns
        # all 0 when num_gt == 0)
        assert not np.any(np.asarray(res.gt_inds) > 0)

    def test_low_quality_match(self):
        # gt has no anchor above pos_iou_thr; its best anchor is claimed
        assigner = MaxIoUAssigner(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                  min_pos_iou=0.3)
        bboxes = jnp.array([
            [0., 0., 10., 5.],    # iou 0.5 with gt: between 0.3 and 0.7
        ])
        gt, gv = pad_gt([[0, 0, 10, 10]], 2)
        res = assigner.assign(bboxes, gt, gv)
        assert int(res.gt_inds[0]) == 1  # claimed by low-quality match

    def test_low_quality_last_gt_wins(self):
        # two identical gts share the same best anchor → later gt wins
        # (reference's in-order overwrite, max_iou_assigner.py:127)
        assigner = MaxIoUAssigner(pos_iou_thr=0.9, neg_iou_thr=0.3,
                                  min_pos_iou=0.1)
        bboxes = jnp.array([[0., 0., 10., 5.]])
        gt, gv = pad_gt([[0, 0, 10, 10], [0, 0, 10, 10]], 4)
        res = assigner.assign(bboxes, gt, gv)
        assert int(res.gt_inds[0]) == 2

    def test_no_low_quality(self):
        assigner = MaxIoUAssigner(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                  min_pos_iou=0.3, match_low_quality=False)
        bboxes = jnp.array([[0., 0., 10., 5.]])
        gt, gv = pad_gt([[0, 0, 10, 10]], 2)
        res = assigner.assign(bboxes, gt, gv)
        assert int(res.gt_inds[0]) != 1

    def test_ignore_between_thresholds(self):
        assigner = MaxIoUAssigner(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                  min_pos_iou=0.99, match_low_quality=True)
        bboxes = jnp.array([[0., 0., 10., 6.]])  # iou 0.6: between thr
        gt, gv = pad_gt([[0, 0, 10, 10]], 2)
        res = assigner.assign(bboxes, gt, gv)
        assert int(res.gt_inds[0]) == -1

    def test_bbox_valid_mask(self):
        bboxes = jnp.array([[0., 0., 10., 10.], [0., 0., 10., 10.]])
        gt, gv = pad_gt([[0, 0, 10, 10]], 2)
        res = self.assigner.assign(bboxes, gt, gv,
                                   bbox_valid=jnp.array([False, True]))
        assert int(res.gt_inds[0]) == -1
        assert int(res.gt_inds[1]) == 1


class TestRandomSampler:
    def test_counts_and_validity(self):
        n = 100
        rs = np.random.RandomState(3)
        bboxes = rs.rand(n, 4).astype(np.float32) * 50
        bboxes[:, 2:] += bboxes[:, :2] + 5
        gt, gv = pad_gt([[0, 0, 20, 20], [30, 30, 50, 50]], 8)
        labels = jnp.zeros(8, jnp.int32)
        assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                  min_pos_iou=0.5)
        res = assigner.assign(jnp.asarray(bboxes), gt, gv, labels)
        sampler = RandomSampler(num=16, pos_fraction=0.25,
                                add_gt_as_proposals=True)
        out = sampler.sample(jax.random.PRNGKey(0), res,
                             jnp.asarray(bboxes), gt, gv, labels)
        num_pos = int(out.num_pos)
        num_neg = int(out.num_neg)
        assert num_pos <= 4                      # 16 * 0.25
        assert num_pos >= 2                      # the 2 gts are candidates
        assert num_pos + num_neg == int(np.asarray(out.valid).sum())
        assert num_pos + num_neg <= 16
        # positives come first in slots
        is_pos = np.asarray(out.is_pos)
        assert not np.any(np.diff(is_pos.astype(int)) > 0)
        # sampled pos boxes have the matched gt attached
        pgb = np.asarray(out.pos_gt_bboxes)[is_pos]
        assert pgb.shape[0] == num_pos
        assert np.all(np.asarray(out.pos_gt_labels)[is_pos] >= 0)

    def test_fills_with_negatives_when_few_pos(self):
        # 1 gt, many negatives → expect 1 pos + 15 neg
        bboxes = np.array([[0, 0, 20, 20]] +
                          [[100 + i, 100, 120 + i, 120] for i in range(40)],
                          np.float32)
        gt, gv = pad_gt([[0, 0, 20, 20]], 4)
        labels = jnp.zeros(4, jnp.int32)
        assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                  min_pos_iou=0.5)
        res = assigner.assign(jnp.asarray(bboxes), gt, gv, labels)
        sampler = RandomSampler(num=16, pos_fraction=0.25,
                                add_gt_as_proposals=False)
        out = sampler.sample(jax.random.PRNGKey(1), res,
                             jnp.asarray(bboxes), gt, gv, labels)
        assert int(out.num_pos) == 1
        assert int(out.num_neg) == 15
