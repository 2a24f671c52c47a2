"""GuidedAnchor location-target parity vs the reference torch
ga_loc_targets (mmdet/models/dense_heads/guided_anchor_head.py:376):
identical per-level target/weight maps (center=1/w1, ignore ring +
adjacent-level ring=w0, elsewhere w0.1) and avg factor."""
import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')


def test_ga_loc_targets_parity():
    import torch
    refbridge.install()
    from mmcv.utils import ConfigDict
    from mmdet.core import build_anchor_generator as ref_build_ag
    from mmdet.models.dense_heads.guided_anchor_head import \
        GuidedAnchorHead as RefHead

    from swindet_tpu.models.dense_heads.guided_anchor_head import \
        GuidedAnchorHead

    strides = [4, 8, 16, 32]
    featmap_sizes = [(32, 48), (16, 24), (8, 12), (4, 6)]
    ag_cfg = dict(type='AnchorGenerator', octave_base_scale=8,
                  scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                  strides=strides)

    ref = RefHead.__new__(RefHead)
    ref.approx_anchor_generator = ref_build_ag(dict(ag_cfg))
    ref.train_cfg = ConfigDict(center_ratio=0.2, ignore_ratio=0.5)

    rs = np.random.RandomState(0)
    b, g = 2, 6
    xy = rs.rand(b, g, 2).astype(np.float32) * 80
    wh = rs.rand(b, g, 2).astype(np.float32) * 100 + 8
    gt = np.concatenate([xy, xy + wh], -1)
    gt_valid = np.ones((b, g), bool)
    gt_valid[1, 4:] = False

    gt_list = [torch.tensor(gt[i][gt_valid[i]]) for i in range(b)]
    r_t, r_w, r_avg = ref.ga_loc_targets(gt_list, featmap_sizes)

    ours = GuidedAnchorHead.__new__(GuidedAnchorHead)
    object.__setattr__(ours, 'train_cfg',
                       dict(center_ratio=0.2, ignore_ratio=0.5))
    from swindet_tpu.models.builder import build_anchor_generator
    object.__setattr__(ours, 'approx_gen',
                       build_anchor_generator(dict(ag_cfg)))
    o_t, o_w, o_avg = ours.ga_loc_targets(
        jnp.asarray(gt), jnp.asarray(gt_valid), featmap_sizes)

    assert o_avg == pytest.approx(r_avg)
    for lvl in range(len(strides)):
        np.testing.assert_array_equal(
            np.asarray(o_t[lvl]), r_t[lvl].numpy()[:, 0],
            err_msg=f'targets lvl{lvl}')
        np.testing.assert_allclose(
            np.asarray(o_w[lvl]), r_w[lvl].numpy()[:, 0],
            rtol=1e-6, err_msg=f'weights lvl{lvl}')
