"""Golden parity: GHMC/GHMR/BalancedL1 vs the reference losses; OHEM
ranked-by-loss selection semantics (reference: ghm_loss.py,
balanced_l1_loss.py, ohem_sampler.py)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from . import refbridge

pytestmark = pytest.mark.skipif(not refbridge.reference_available(),
                                reason='reference checkout not mounted')


def test_ghmc_parity():
    refbridge.install()
    from mmdet.models.losses import GHMC as RefGHMC
    from swindet_tpu.models.losses.losses import GHMC

    rs = np.random.RandomState(0)
    n, c = 200, 5
    pred = rs.randn(n, c).astype(np.float32) * 2
    target = (rs.rand(n, c) > 0.8).astype(np.float32)
    lw = (rs.rand(n, c) > 0.1).astype(np.float32)

    r = RefGHMC(bins=10, momentum=0)(torch.from_numpy(pred),
                                     torch.from_numpy(target),
                                     torch.from_numpy(lw))
    m = GHMC(bins=10)(jnp.asarray(pred), jnp.asarray(target),
                      label_weight=jnp.asarray(lw))
    np.testing.assert_allclose(float(m), float(r), rtol=1e-4)


def test_ghmr_parity():
    refbridge.install()
    from mmdet.models.losses import GHMR as RefGHMR
    from swindet_tpu.models.losses.losses import GHMR

    rs = np.random.RandomState(1)
    n = 150
    pred = rs.randn(n, 4).astype(np.float32)
    target = rs.randn(n, 4).astype(np.float32)
    lw = (rs.rand(n, 4) > 0.2).astype(np.float32)

    r = RefGHMR(mu=0.02, bins=10)(torch.from_numpy(pred),
                                  torch.from_numpy(target),
                                  torch.from_numpy(lw))
    m = GHMR(mu=0.02, bins=10)(jnp.asarray(pred), jnp.asarray(target),
                               label_weight=jnp.asarray(lw))
    np.testing.assert_allclose(float(m), float(r), rtol=1e-4)


def test_balanced_l1_parity():
    refbridge.install()
    from mmdet.models.losses import BalancedL1Loss as RefBL1
    from swindet_tpu.models.losses.losses import BalancedL1Loss

    rs = np.random.RandomState(2)
    n = 64
    pred = rs.randn(n, 4).astype(np.float32) * 2
    target = rs.randn(n, 4).astype(np.float32)
    w = rs.rand(n, 4).astype(np.float32)

    r = RefBL1()(torch.from_numpy(pred), torch.from_numpy(target),
                 weight=torch.from_numpy(w), avg_factor=37.0)
    m = BalancedL1Loss()(jnp.asarray(pred), jnp.asarray(target),
                         weight=jnp.asarray(w), avg_factor=37.0)
    np.testing.assert_allclose(float(m), float(r), rtol=1e-5)


def test_ohem_selects_hardest():
    """OHEM keeps the highest-loss negatives (ohem_sampler.py:47
    loss.topk semantics)."""
    from swindet_tpu.core.bbox.assigners import AssignResult
    from swindet_tpu.core.bbox.samplers import OHEMSampler

    n = 32
    # 2 positives, 30 negatives
    gt_inds = jnp.asarray([1, 2] + [0] * 30, jnp.int32)
    assign = AssignResult(gt_inds=gt_inds,
                          max_overlaps=jnp.zeros((n,)),
                          labels=jnp.where(gt_inds > 0, 0, -1))
    bboxes = jnp.tile(jnp.asarray([[0., 0., 10., 10.]]), (n, 1))
    gt_bboxes = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15]],
                            jnp.float32)
    gt_valid = jnp.ones((2,), bool)
    gt_labels = jnp.asarray([0, 1], jnp.int32)
    hardness = jnp.arange(n, dtype=jnp.float32)   # later = harder

    s = OHEMSampler(num=8, pos_fraction=0.25, add_gt_as_proposals=False)
    res = s.sample(jax.random.PRNGKey(0), assign, bboxes, gt_bboxes,
                   gt_valid, gt_labels, hardness=hardness)
    assert int(res.num_pos) == 2
    # selected negatives must be exactly the 6 highest-hardness ones
    neg_inds = sorted(int(i) for i, p, v in
                      zip(res.inds, res.is_pos, res.valid)
                      if v and not p)
    assert neg_inds == list(range(26, 32))


def test_score_hlr_selection():
    """ScoreHLR keeps the highest-importance negatives (selection
    semantics of score_hlr_sampler.py; importance precomputed by the
    RoI-head pre-pass and passed as the hardness key)."""
    from swindet_tpu.core.bbox.assigners import AssignResult
    from swindet_tpu.core.bbox.samplers import ScoreHLRSampler

    n = 24
    gt_inds = jnp.asarray([1] + [0] * 23, jnp.int32)
    assign = AssignResult(gt_inds=gt_inds,
                          max_overlaps=jnp.zeros((n,)),
                          labels=jnp.where(gt_inds > 0, 0, -1))
    bboxes = jnp.tile(jnp.asarray([[0., 0., 10., 10.]]), (n, 1))
    # importance: candidates 20-23 most important; below-thr ones very low
    imp = jnp.concatenate([jnp.full((20,), -1e4) +
                           jnp.arange(20, dtype=jnp.float32),
                           jnp.asarray([50., 60., 70., 80.])])
    s = ScoreHLRSampler(num=8, pos_fraction=0.125,
                        add_gt_as_proposals=False)
    res = s.sample(jax.random.PRNGKey(0), assign, bboxes,
                   jnp.zeros((1, 4)), jnp.ones((1,), bool),
                   jnp.asarray([0], jnp.int32), hardness=imp)
    neg_sel = sorted(int(i) for i, v, p in
                     zip(res.inds, res.valid, res.is_pos)
                     if v and not p)
    # the 4 valid (high-importance) negs selected first, then backfill
    assert set(neg_sel) >= {20, 21, 22, 23}
    assert len(neg_sel) == 7
