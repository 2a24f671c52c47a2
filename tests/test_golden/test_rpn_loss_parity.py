"""RPNHead training-loss parity: with ``sampler.num`` larger than the
candidate count, RandomSampler keeps EVERY positive and negative, so
the usually-stochastic RPN loss becomes deterministic and must match
the reference torch head exactly (reference anchor_head.py:426 loss
via rpn_head.py loss: BCE + L1 over sampled anchors, normalized by
num_total_samples)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')

H = W = 64
STRIDES = [8, 16, 32]
SIZES = [(8, 8), (4, 4), (2, 2)]
B, G = 2, 5
NA = 3


def test_rpn_loss_parity():
    import torch
    refbridge.install()
    from mmcv.utils import ConfigDict
    from mmdet.models.dense_heads.rpn_head import RPNHead as Ref
    from swindet_tpu.models.builder import build_head

    anchor_cfg = dict(type='AnchorGenerator', scales=[8],
                      ratios=[0.5, 1.0, 2.0], strides=STRIDES)
    coder_cfg = dict(type='DeltaXYWHBBoxCoder',
                     target_means=[.0, .0, .0, .0],
                     target_stds=[1.0, 1.0, 1.0, 1.0])
    train_cfg = dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                      neg_iou_thr=0.3, min_pos_iou=0.3,
                      match_low_quality=True, ignore_iof_thr=-1),
        # num == all anchors (252) → RandomSampler keeps everything
        sampler=dict(type='RandomSampler', num=252, pos_fraction=0.5,
                     neg_pos_ub=-1, add_gt_as_proposals=False),
        allowed_border=-1, pos_weight=-1, debug=False)
    common = dict(in_channels=8, feat_channels=8,
                  anchor_generator=anchor_cfg, bbox_coder=coder_cfg,
                  loss_cls=dict(type='CrossEntropyLoss',
                                use_sigmoid=True, loss_weight=1.0),
                  loss_bbox=dict(type='L1Loss', loss_weight=1.0))
    ref = Ref(train_cfg=ConfigDict(train_cfg), **common)

    rs = np.random.RandomState(0)
    cls_maps = [rs.randn(B, NA, sh, sw).astype(np.float32)
                for sh, sw in SIZES]
    box_maps = [rs.randn(B, NA * 4, sh, sw).astype(np.float32) * 0.3
                for sh, sw in SIZES]
    gt = np.zeros((B, G, 4), np.float32)
    gt[..., 0] = rs.rand(B, G) * (W - 40)
    gt[..., 1] = rs.rand(B, G) * (H - 40)
    gt[..., 2] = gt[..., 0] + 8 + rs.rand(B, G) * 30
    gt[..., 3] = gt[..., 1] + 8 + rs.rand(B, G) * 30
    metas = [dict(img_shape=(H, W, 3), pad_shape=(H, W, 3))
             for _ in range(B)]
    r = ref.loss([torch.tensor(m) for m in cls_maps],
                 [torch.tensor(m) for m in box_maps],
                 [torch.tensor(gt[i]) for i in range(B)], metas)
    r_cls = sum(float(v) for v in r['loss_rpn_cls'])
    r_box = sum(float(v) for v in r['loss_rpn_bbox'])

    ours = build_head(dict(type='RPNHead', train_cfg=train_cfg,
                           **common))
    variables = ours.init(
        jax.random.PRNGKey(0),
        [jnp.zeros((1, sh, sw, 8)) for sh, sw in SIZES])
    nhwc = lambda ms: [jnp.asarray(m.transpose(0, 2, 3, 1)) for m in ms]
    o = ours.apply(
        variables, jax.random.PRNGKey(1),
        nhwc(cls_maps), nhwc(box_maps),
        jnp.asarray(gt), jnp.ones((B, G), bool), None,
        jnp.asarray([[H, W]] * B, jnp.int32),
        jnp.asarray([[H, W]] * B, jnp.int32),
        method='loss')
    assert float(o['loss_rpn_cls']) == pytest.approx(r_cls, rel=1e-4)
    assert float(o['loss_rpn_bbox']) == pytest.approx(r_box, rel=1e-4)
