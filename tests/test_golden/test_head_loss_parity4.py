"""Training-loss parity, wave 4: VFNet — BOTH assignment branches
(use_atss=True: ATSS on square anchors, the reference default;
use_atss=False: FCOS scale-range targets) + varifocal cls with
IoU-aware targets + IoU-weighted bbox losses — deterministic, so loss
values must match the reference torch head on identical predictions +
gts."""
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


def test_vfnet_loss_parity():
    import torch
    refbridge.install()
    from mmdet.models.dense_heads.vfnet_head import VFNetHead as Ref
    from swindet_tpu.models.builder import build_head

    common = dict(num_classes=4, in_channels=8, feat_channels=8,
                  stacked_convs=1, strides=STRIDES,
                  regress_ranges=((-1, 24), (24, 48), (48, 1e8)),
                  norm_cfg=dict(type='GN', num_groups=4,
                                requires_grad=True),
                  loss_cls=dict(type='VarifocalLoss', use_sigmoid=True,
                                alpha=0.75, gamma=2.0, iou_weighted=True,
                                loss_weight=1.0),
                  loss_bbox=dict(type='GIoULoss', loss_weight=1.5),
                  loss_bbox_refine=dict(type='GIoULoss',
                                        loss_weight=2.0))

    ref = Ref(use_atss=False, use_vfl=True, center_sampling=False,
              dcn_on_last_conv=False, **common)
    ref.train_cfg = None

    rs = np.random.RandomState(0)
    cls_maps = [rs.randn(B, 4, sh, sw).astype(np.float32)
                for sh, sw in SIZES]
    # ltrb distances must be positive (the head emits exp/scaled)
    box_maps = [np.abs(rs.randn(B, 4, sh, sw)).astype(np.float32) * 12
                for sh, sw in SIZES]
    ref_maps = [np.abs(rs.randn(B, 4, sh, sw)).astype(np.float32) * 12
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
                 [torch.tensor(m) for m in box_maps],
                 [torch.tensor(m) for m in ref_maps],
                 [torch.tensor(gt[i]) for i in range(B)],
                 [torch.tensor(labels[i].astype(np.int64))
                  for i in range(B)], metas)

    ours = build_head(dict(type='VFNetHead', use_vfl=True, use_atss=False,
                           dcn_on_last_conv=False, **common))
    variables = ours.init(
        jax.random.PRNGKey(0),
        [jnp.zeros((1, sh, sw, 8)) for sh, sw in SIZES])
    nhwc = lambda ms: [jnp.asarray(m.transpose(0, 2, 3, 1)) for m in ms]
    o = ours.apply(
        variables, jax.random.PRNGKey(1),
        nhwc(cls_maps), nhwc(box_maps), nhwc(ref_maps),
        jnp.asarray(gt), jnp.ones((B, G), bool),
        jnp.asarray(labels.astype(np.int32)),
        jnp.asarray([[H, W]] * B, jnp.int32),
        jnp.asarray([[H, W]] * B, jnp.int32),
        method='loss')
    assert float(o['loss_cls']) == pytest.approx(float(r['loss_cls']),
                                                 rel=1e-3)
    assert float(o['loss_bbox']) == pytest.approx(float(r['loss_bbox']),
                                                  rel=1e-3)
    assert float(o['loss_bbox_rf']) == pytest.approx(
        float(r['loss_bbox_rf']), rel=1e-3)


def test_vfnet_loss_parity_atss():
    import torch
    refbridge.install()
    from mmdet.models.dense_heads.vfnet_head import VFNetHead as Ref
    from swindet_tpu.models.builder import build_head

    ag = dict(type='AnchorGenerator', ratios=[1.0], octave_base_scale=8,
              scales_per_octave=1, center_offset=0.0, strides=STRIDES)
    train_cfg = dict(assigner=dict(type='ATSSAssigner', topk=9),
                     allowed_border=-1, pos_weight=-1, debug=False)
    common = dict(num_classes=4, in_channels=8, feat_channels=8,
                  stacked_convs=1, strides=STRIDES,
                  regress_ranges=((-1, 24), (24, 48), (48, 1e8)),
                  norm_cfg=dict(type='GN', num_groups=4,
                                requires_grad=True),
                  loss_cls=dict(type='VarifocalLoss', use_sigmoid=True,
                                alpha=0.75, gamma=2.0, iou_weighted=True,
                                loss_weight=1.0),
                  loss_bbox=dict(type='GIoULoss', loss_weight=1.5),
                  loss_bbox_refine=dict(type='GIoULoss',
                                        loss_weight=2.0))

    ref = Ref(use_atss=True, use_vfl=True, center_sampling=False,
              dcn_on_last_conv=False, anchor_generator=dict(ag),
              sync_num_pos=False, **common)
    from mmcv.utils import Config as _C
    ref.train_cfg = _C(dict(train_cfg)) if hasattr(_C, '__call__') \
        else train_cfg
    from mmdet.core import build_assigner as ref_build_assigner
    from mmdet.core import build_sampler as ref_build_sampler
    ref.assigner = ref_build_assigner(dict(train_cfg['assigner']))
    ref.sampler = ref_build_sampler(dict(type='PseudoSampler'),
                                    context=ref)

    rs = np.random.RandomState(0)
    cls_maps = [rs.randn(B, 4, sh, sw).astype(np.float32)
                for sh, sw in SIZES]
    box_maps = [np.abs(rs.randn(B, 4, sh, sw)).astype(np.float32) * 12
                for sh, sw in SIZES]
    ref_maps = [np.abs(rs.randn(B, 4, sh, sw)).astype(np.float32) * 12
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
                 [torch.tensor(m) for m in box_maps],
                 [torch.tensor(m) for m in ref_maps],
                 [torch.tensor(gt[i]) for i in range(B)],
                 [torch.tensor(labels[i].astype(np.int64))
                  for i in range(B)], metas)

    ours = build_head(dict(type='VFNetHead', use_vfl=True, use_atss=True,
                           dcn_on_last_conv=False,
                           anchor_generator=dict(ag),
                           train_cfg=dict(train_cfg), **common))
    variables = ours.init(
        jax.random.PRNGKey(0),
        [jnp.zeros((1, sh, sw, 8)) for sh, sw in SIZES])
    nhwc = lambda ms: [jnp.asarray(m.transpose(0, 2, 3, 1)) for m in ms]
    o = ours.apply(
        variables, jax.random.PRNGKey(1),
        nhwc(cls_maps), nhwc(box_maps), nhwc(ref_maps),
        jnp.asarray(gt), jnp.ones((B, G), bool),
        jnp.asarray(labels.astype(np.int32)),
        jnp.asarray([[H, W]] * B, jnp.int32),
        jnp.asarray([[H, W]] * B, jnp.int32),
        method='loss')
    assert float(o['loss_cls']) == pytest.approx(float(r['loss_cls']),
                                                 rel=1e-3)
    assert float(o['loss_bbox']) == pytest.approx(float(r['loss_bbox']),
                                                  rel=1e-3)
    assert float(o['loss_bbox_rf']) == pytest.approx(
        float(r['loss_bbox_rf']), rel=1e-3)
