"""Training-loss parity, wave 5: RepPoints ★ — init stage (PointAssigner
+ PseudoSampler) and refine stage (MaxIoUAssigner + PseudoSampler) are
both deterministic, so the three loss terms must match the reference
torch head on identical predictions + gts."""
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
NP = 9


def test_reppoints_loss_parity():
    import torch
    refbridge.install()
    from mmcv.utils import ConfigDict
    from mmdet.models.dense_heads.reppoints_head import \
        RepPointsHead as Ref
    from swindet_tpu.models.builder import build_head

    common = dict(num_classes=4, in_channels=8, feat_channels=8,
                  point_feat_channels=8, stacked_convs=1,
                  num_points=NP, gradient_mul=0.1,
                  point_strides=STRIDES, point_base_scale=4,
                  transform_method='moment', moment_mul=0.01,
                  loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                                gamma=2.0, alpha=0.25, loss_weight=1.0),
                  loss_bbox_init=dict(type='SmoothL1Loss', beta=0.11,
                                      loss_weight=0.5),
                  loss_bbox_refine=dict(type='SmoothL1Loss', beta=0.11,
                                        loss_weight=1.0))
    train_cfg = dict(
        init=dict(
            assigner=dict(type='PointAssigner', scale=4, pos_num=1),
            allowed_border=-1, pos_weight=-1, debug=False),
        refine=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.4, min_pos_iou=0,
                          ignore_iof_thr=-1),
            allowed_border=-1, pos_weight=-1, debug=False))

    ref = Ref(train_cfg=ConfigDict(train_cfg), **common)

    rs = np.random.RandomState(0)
    cls_maps = [rs.randn(B, 4, sh, sw).astype(np.float32)
                for sh, sw in SIZES]
    init_maps = [rs.randn(B, 2 * NP, sh, sw).astype(np.float32)
                 for sh, sw in SIZES]
    refine_maps = [rs.randn(B, 2 * NP, sh, sw).astype(np.float32)
                   for sh, sw in SIZES]
    gt = np.zeros((B, G, 4), np.float32)
    gt[..., 0] = rs.rand(B, G) * (W - 40)
    gt[..., 1] = rs.rand(B, G) * (H - 40)
    gt[..., 2] = gt[..., 0] + 8 + rs.rand(B, G) * 30
    gt[..., 3] = gt[..., 1] + 8 + rs.rand(B, G) * 30
    labels = rs.randint(0, 4, (B, G))
    metas = [dict(img_shape=(H, W, 3), pad_shape=(H, W, 3))
             for _ in range(B)]
    r = ref.loss([torch.tensor(m) for m in cls_maps],
                 [torch.tensor(m) for m in init_maps],
                 [torch.tensor(m) for m in refine_maps],
                 [torch.tensor(gt[i]) for i in range(B)],
                 [torch.tensor(labels[i].astype(np.int64))
                  for i in range(B)], metas)
    r_cls = sum(float(v) for v in r['loss_cls'])
    r_init = sum(float(v) for v in r['loss_pts_init'])
    r_refine = sum(float(v) for v in r['loss_pts_refine'])

    ours = build_head(dict(type='RepPointsHead', train_cfg=train_cfg,
                           **common))
    variables = ours.init(
        jax.random.PRNGKey(0),
        [jnp.zeros((1, sh, sw, 8)) for sh, sw in SIZES])
    # zero moment_transfer matches the reference's fresh init
    nhwc = lambda ms: [jnp.asarray(m.transpose(0, 2, 3, 1)) for m in ms]
    o = ours.apply(
        variables, jax.random.PRNGKey(1),
        nhwc(cls_maps), nhwc(init_maps), nhwc(refine_maps),
        jnp.asarray(gt), jnp.ones((B, G), bool),
        jnp.asarray(labels.astype(np.int32)),
        jnp.asarray([[H, W]] * B, jnp.int32),
        jnp.asarray([[H, W]] * B, jnp.int32),
        method='loss')
    assert float(o['loss_cls']) == pytest.approx(r_cls, rel=1e-3)
    assert float(o['loss_pts_init']) == pytest.approx(r_init, rel=1e-3)
    assert float(o['loss_pts_refine']) == pytest.approx(r_refine,
                                                        rel=1e-3)
