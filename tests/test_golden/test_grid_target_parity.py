"""Grid R-CNN heatmap targets vs the reference, element-exact
(reference: mask_heads/grid_head.py:220 get_targets — 2x box expansion,
int-truncated grid-point cell, radius circle, Grid-R-CNN-Plus
half-sized sub-regions). Complements the grad-parity test, whose
grid-head conv leaves are fp-noise-limited (GroupNorm backward
cancellation at init)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')


def test_grid_targets_match_reference():
    refbridge.install()
    import torch
    from mmcv.utils import ConfigDict
    from mmdet.models.roi_heads.mask_heads.grid_head import GridHead as TG
    from swindet_tpu.models.builder import build_head

    head_cfg = dict(grid_points=9, num_convs=2, in_channels=32,
                    point_feat_channels=8,
                    norm_cfg=dict(type='GN', num_groups=9),
                    loss_grid=dict(type='CrossEntropyLoss',
                                   use_sigmoid=True, loss_weight=15))
    tg = TG(**head_cfg)
    head = build_head(dict(type='GridHead', **head_cfg))

    rs = np.random.RandomState(0)
    m = 24
    pos = np.zeros((m, 4), np.float32)
    gt = np.zeros((m, 4), np.float32)
    for i in range(m):
        x1, y1 = rs.rand(2) * 40
        w, h = rs.rand(2) * 30 + 12
        pos[i] = [x1, y1, x1 + w, y1 + h]
        # gt sometimes pokes outside the proposal (exercises clipping)
        gt[i] = pos[i] + rs.randn(4) * 6
        gt[i, 2] = max(gt[i, 2], gt[i, 0] + 4)
        gt[i, 3] = max(gt[i, 3], gt[i, 1] + 4)
    # a too-small box the reference skips entirely
    pos[0] = [5, 5, 8, 8]
    gt[0] = [5, 5, 8, 8]

    class SR:
        pass

    sr = SR()
    sr.pos_bboxes = torch.from_numpy(pos)
    sr.pos_gt_bboxes = torch.from_numpy(gt)
    ref_t = tg.get_targets([sr], ConfigDict(dict(pos_radius=1))).numpy()

    variables = head.init(jax.random.PRNGKey(0),
                          jnp.zeros((2, 14, 14, 32)))
    ours = np.asarray(head.apply(variables, jnp.asarray(pos),
                                 jnp.asarray(gt), 1,
                                 method='get_targets'))
    np.testing.assert_array_equal(ours.transpose(0, 3, 1, 2), ref_t)
