"""CornerNet heatmap-target parity vs the reference torch get_targets
(mmdet/models/dense_heads/corner_head.py:310): identical top-left /
bottom-right class heatmaps (gaussian radius, per-class max painting)
on identical gts."""
import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')


def test_corner_heatmap_targets_parity():
    import torch
    refbridge.install()
    from mmdet.models.dense_heads.corner_head import CornerHead as Ref
    from swindet_tpu.models.dense_heads.corner_head import CornerHead

    C = 4
    b, g = 2, 6
    H = W = 96                    # image/canvas
    fh, fw = 24, 24               # feature map
    rs = np.random.RandomState(0)
    gt = np.zeros((b, g, 4), np.float32)
    gt[..., 0] = rs.rand(b, g) * (W - 50)
    gt[..., 1] = rs.rand(b, g) * (H - 50)
    gt[..., 2] = gt[..., 0] + 10 + rs.rand(b, g) * 40
    gt[..., 3] = gt[..., 1] + 10 + rs.rand(b, g) * 40
    labels = rs.randint(0, C, (b, g))

    ref = Ref.__new__(Ref)
    ref.num_classes = C
    ref.corner_emb_channels = 1
    r = ref.get_targets(
        [torch.tensor(gt[i]) for i in range(b)],
        [torch.tensor(labels[i].astype(np.int64)) for i in range(b)],
        feat_shape=(b, C, fh, fw),
        img_shape=(H, W, 3),
        with_corner_emb=True)

    ours = CornerHead.__new__(CornerHead)
    object.__setattr__(ours, 'num_classes', C)
    o = ours.get_targets(jnp.asarray(gt), jnp.ones((b, g), bool),
                         jnp.asarray(labels.astype(np.int32)),
                         (fh, fw),
                         jnp.asarray([[H, W]] * b, jnp.int32))
    o_tl = np.asarray(o['tl_heat'])      # (B, H, W, C)
    o_br = np.asarray(o['br_heat'])
    r_tl = r['topleft_heatmap'].numpy().transpose(0, 2, 3, 1)
    r_br = r['bottomright_heatmap'].numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(o_tl, r_tl, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(o_br, r_br, rtol=1e-4, atol=1e-4)
    assert (o_tl == 1.0).sum() > 0       # corners painted
