"""Mask-target + FCNMaskHead loss parity vs the reference torch path
(core/mask/mask_target.py:6 via the stubbed pure-torch roi_align, and
fcn_mask_head.py:138 loss): the separable-matmul crop must produce the
same 28×28 binary targets as the reference's crop_and_resize, and the
BCE loss the same value."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')

MS = 28


def _setup(seed=0, m=6, g=4, h=80, w=96):
    rs = np.random.RandomState(seed)
    masks = np.zeros((g, h, w), np.uint8)
    for i in range(g):
        y0, x0 = rs.randint(0, h - 30), rs.randint(0, w - 30)
        masks[i, y0:y0 + rs.randint(10, 30), x0:x0 + rs.randint(10, 30)] = 1
        # carve a hole for non-trivial shapes
        masks[i, y0 + 4:y0 + 8, x0 + 4:x0 + 8] = 0
    boxes = np.zeros((m, 4), np.float32)
    boxes[:, 0] = rs.rand(m) * (w - 40)
    boxes[:, 1] = rs.rand(m) * (h - 40)
    boxes[:, 2] = boxes[:, 0] + 8 + rs.rand(m) * 30
    boxes[:, 3] = boxes[:, 1] + 8 + rs.rand(m) * 30
    inds = rs.randint(0, g, m)
    return masks, boxes, inds


def test_mask_target_parity():
    import torch
    refbridge.install()
    from mmcv.utils import ConfigDict
    from mmdet.core.mask.mask_target import mask_target_single
    from mmdet.core.mask.structures import BitmapMasks
    from swindet_tpu.models.roi_heads.mask_heads import FCNMaskHead

    masks, boxes, inds = _setup()
    ref_t = mask_target_single(
        torch.tensor(boxes), torch.tensor(inds.astype(np.int64)),
        BitmapMasks(masks, masks.shape[1], masks.shape[2]),
        ConfigDict(dict(mask_size=MS)))

    our_t = FCNMaskHead.get_targets(
        jnp.asarray(masks.astype(np.float32)), jnp.asarray(boxes),
        jnp.asarray(inds.astype(np.int32)), MS)
    np.testing.assert_array_equal(np.asarray(our_t),
                                  ref_t.numpy().astype(np.float32))
    assert float(np.asarray(our_t).sum()) > 0


def test_mask_loss_parity():
    import torch
    refbridge.install()
    from mmdet.models.roi_heads.mask_heads.fcn_mask_head import \
        FCNMaskHead as Ref
    from mmcv.utils import ConfigDict
    from swindet_tpu.models.roi_heads.mask_heads import FCNMaskHead

    K, m = 4, 6
    rs = np.random.RandomState(1)
    pred = rs.randn(m, K, MS, MS).astype(np.float32)
    targets = (rs.rand(m, MS, MS) > 0.5).astype(np.float32)
    labels = rs.randint(0, K, m)

    ref = Ref(num_convs=0, roi_feat_size=MS, in_channels=4,
              num_classes=K,
              upsample_cfg=ConfigDict(dict(type=None)))
    r = ref.loss(torch.tensor(pred), torch.tensor(targets),
                 torch.tensor(labels.astype(np.int64)))

    ours = FCNMaskHead(num_convs=0, in_channels=4, num_classes=K)
    variables = ours.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, MS, MS, 4)))
    o = ours.apply(variables,
                   jnp.asarray(pred.transpose(0, 2, 3, 1)),
                   jnp.asarray(targets),
                   jnp.asarray(labels.astype(np.int32)),
                   jnp.ones(m, jnp.float32), method='loss')
    assert float(o['loss_mask']) == pytest.approx(
        float(r['loss_mask']), rel=1e-4)
