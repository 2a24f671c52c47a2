"""FoveaBox target parity vs the reference torch _get_target_single
(mmdet/models/dense_heads/fovea_head.py:199): identical per-level label
maps and log-space bbox targets, incl. the descending-area paint order
(smallest gt wins) and the 1/16..16 clamp."""
import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')

STRIDES = (8, 16, 32)
BASE_EDGES = (16, 32, 64)
RANGES = ((1, 64), (32, 128), (64, 512))
SIGMA = 0.4
NC = 5
SIZES = [(16, 20), (8, 10), (4, 5)]


def test_fovea_targets_parity():
    import torch
    refbridge.install()
    from mmdet.models.dense_heads.fovea_head import FoveaHead as RefHead
    from swindet_tpu.models.dense_heads.fovea_head import FoveaHead

    ref = RefHead.__new__(RefHead)
    ref.base_edge_list = list(BASE_EDGES)
    ref.scale_ranges = list(RANGES)
    ref.strides = list(STRIDES)
    ref.sigma = SIGMA
    ref.num_classes = NC

    rs = np.random.RandomState(3)
    g = 7
    xy = rs.rand(g, 2).astype(np.float32) * 60
    wh = rs.rand(g, 2).astype(np.float32) ** 2 * 180 + 4
    gt = np.concatenate([xy, xy + wh], -1)
    labels = rs.randint(0, NC, g).astype(np.int64)

    points = []
    for h, w in SIZES:
        y, x = torch.meshgrid(torch.arange(h).float(),
                              torch.arange(w).float())
        points.append((y + 0.5, x + 0.5))
    r_lab, r_tgt = ref._get_target_single(
        torch.tensor(gt), torch.tensor(labels),
        featmap_size_list=SIZES, point_list=points)

    ours = FoveaHead.__new__(FoveaHead)
    object.__setattr__(ours, 'sigma', SIGMA)
    object.__setattr__(ours, 'num_classes', NC)
    for lvl, (fs, stride, base, bounds) in enumerate(
            zip(SIZES, STRIDES, BASE_EDGES, RANGES)):
        o_lab, o_tgt, _ = ours._target_level(
            fs, stride, base, bounds, jnp.asarray(gt),
            jnp.ones(g, bool), jnp.asarray(labels.astype(np.int32)))
        o_lab = np.asarray(o_lab).reshape(fs)
        np.testing.assert_array_equal(
            o_lab, r_lab[lvl].numpy(), err_msg=f'labels lvl{lvl}')
        # background target cells are UNDEFINED in the reference
        # (`gt_bboxes_raw.new(h, w, 4) + 1` = uninitialized memory + 1,
        # fovea_head.py:216) and only positives enter the loss —
        # compare positives only
        pos = o_lab < NC
        np.testing.assert_allclose(
            np.asarray(o_tgt).reshape(fs + (4,))[pos],
            r_tgt[lvl].numpy()[pos], rtol=1e-4, atol=1e-5,
            err_msg=f'targets lvl{lvl}')
        assert pos.sum() > 0 or lvl == 2  # non-vacuous on dense levels
