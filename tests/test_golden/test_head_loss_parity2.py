"""Training-loss parity, wave 2: ATSS, GFL, FCOS — all deterministic
(ATSS top-k assignment / FCOS scale-range targets; no RNG), so the
loss values must match the reference torch heads exactly on identical
predictions + gts."""
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


def _gts(rs):
    gt = np.zeros((B, G, 4), np.float32)
    gt[..., 0] = rs.rand(B, G) * (W - 40)
    gt[..., 1] = rs.rand(B, G) * (H - 40)
    gt[..., 2] = gt[..., 0] + 8 + rs.rand(B, G) * 30
    gt[..., 3] = gt[..., 1] + 8 + rs.rand(B, G) * 30
    return gt, rs.randint(0, 4, (B, G))


def _nhwc(maps):
    return [jnp.asarray(m.transpose(0, 2, 3, 1)) for m in maps]


def _meta():
    return [dict(img_shape=(H, W, 3), pad_shape=(H, W, 3))
            for _ in range(B)]


def _run_ours(head, variables, outs, gt, labels):
    return head.apply(
        variables, jax.random.PRNGKey(1), *outs,
        jnp.asarray(gt), jnp.ones((B, G), bool),
        jnp.asarray(labels.astype(np.int32)),
        jnp.asarray([[H, W]] * B, jnp.int32),
        jnp.asarray([[H, W]] * B, jnp.int32),
        method='loss')


def test_atss_loss_parity():
    import torch
    refbridge.install()
    from mmcv.utils import ConfigDict
    from mmdet.models.dense_heads.atss_head import ATSSHead as Ref
    from swindet_tpu.models.builder import build_head

    anchor_cfg = dict(type='AnchorGenerator', ratios=[1.0],
                      octave_base_scale=8, scales_per_octave=1,
                      strides=STRIDES)
    coder_cfg = dict(type='DeltaXYWHBBoxCoder',
                     target_means=[.0, .0, .0, .0],
                     target_stds=[0.1, 0.1, 0.2, 0.2])
    train_cfg = dict(assigner=dict(type='ATSSAssigner', topk=9),
                     allowed_border=-1, pos_weight=-1, debug=False)
    common = dict(num_classes=4, in_channels=8, feat_channels=8,
                  stacked_convs=1, anchor_generator=anchor_cfg,
                  bbox_coder=coder_cfg,
                  norm_cfg=dict(type='GN', num_groups=4,
                                requires_grad=True),
                  loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                                gamma=2.0, alpha=0.25, loss_weight=1.0),
                  loss_bbox=dict(type='GIoULoss', loss_weight=2.0),
                  loss_centerness=dict(type='CrossEntropyLoss',
                                       use_sigmoid=True, loss_weight=1.0))
    ref = Ref(train_cfg=ConfigDict(train_cfg), **common)

    rs = np.random.RandomState(0)
    cls_maps = [rs.randn(B, 4, sh, sw).astype(np.float32)
                for sh, sw in SIZES]
    box_maps = [rs.randn(B, 4, sh, sw).astype(np.float32) * 0.3
                for sh, sw in SIZES]
    ctr_maps = [rs.randn(B, 1, sh, sw).astype(np.float32)
                for sh, sw in SIZES]
    gt, labels = _gts(rs)
    r = ref.loss([torch.tensor(m) for m in cls_maps],
                 [torch.tensor(m) for m in box_maps],
                 [torch.tensor(m) for m in ctr_maps],
                 [torch.tensor(gt[i]) for i in range(B)],
                 [torch.tensor(labels[i].astype(np.int64))
                  for i in range(B)], _meta())
    r_cls = sum(float(v) for v in r['loss_cls'])
    r_box = sum(float(v) for v in r['loss_bbox'])
    r_ctr = sum(float(v) for v in r['loss_centerness'])

    ours = build_head(dict(type='ATSSHead', train_cfg=train_cfg,
                           **common))
    variables = ours.init(
        jax.random.PRNGKey(0),
        [jnp.zeros((1, sh, sw, 8)) for sh, sw in SIZES])
    o = _run_ours(ours, variables,
                  (_nhwc(cls_maps), _nhwc(box_maps), _nhwc(ctr_maps)),
                  gt, labels)
    assert float(o['loss_cls']) == pytest.approx(r_cls, rel=1e-4)
    assert float(o['loss_bbox']) == pytest.approx(r_box, rel=1e-3)
    assert float(o['loss_centerness']) == pytest.approx(r_ctr, rel=1e-4)


def test_gfl_loss_parity():
    import torch
    refbridge.install()
    from mmcv.utils import ConfigDict
    from mmdet.models.dense_heads.gfl_head import GFLHead as Ref
    from swindet_tpu.models.builder import build_head

    anchor_cfg = dict(type='AnchorGenerator', ratios=[1.0],
                      octave_base_scale=8, scales_per_octave=1,
                      strides=STRIDES)
    train_cfg = dict(assigner=dict(type='ATSSAssigner', topk=9),
                     allowed_border=-1, pos_weight=-1, debug=False)
    common = dict(num_classes=4, in_channels=8, feat_channels=8,
                  stacked_convs=1, anchor_generator=anchor_cfg,
                  norm_cfg=dict(type='GN', num_groups=4,
                                requires_grad=True),
                  loss_cls=dict(type='QualityFocalLoss',
                                use_sigmoid=True, beta=2.0,
                                loss_weight=1.0),
                  loss_dfl=dict(type='DistributionFocalLoss',
                                loss_weight=0.25),
                  loss_bbox=dict(type='GIoULoss', loss_weight=2.0),
                  reg_max=8)
    ref = Ref(train_cfg=ConfigDict(train_cfg), **common)

    rs = np.random.RandomState(2)
    cls_maps = [rs.randn(B, 4, sh, sw).astype(np.float32)
                for sh, sw in SIZES]
    box_maps = [rs.randn(B, 4 * 9, sh, sw).astype(np.float32)
                for sh, sw in SIZES]
    gt, labels = _gts(rs)
    r = ref.loss([torch.tensor(m) for m in cls_maps],
                 [torch.tensor(m) for m in box_maps],
                 [torch.tensor(gt[i]) for i in range(B)],
                 [torch.tensor(labels[i].astype(np.int64))
                  for i in range(B)], _meta())
    r_cls = sum(float(v) for v in r['loss_cls'])
    r_box = sum(float(v) for v in r['loss_bbox'])
    r_dfl = sum(float(v) for v in r['loss_dfl'])

    ours = build_head(dict(type='GFLHead', train_cfg=train_cfg,
                           **common))
    variables = ours.init(
        jax.random.PRNGKey(0),
        [jnp.zeros((1, sh, sw, 8)) for sh, sw in SIZES])
    o = _run_ours(ours, variables,
                  (_nhwc(cls_maps), _nhwc(box_maps)), gt, labels)
    assert float(o['loss_cls']) == pytest.approx(r_cls, rel=1e-4)
    assert float(o['loss_bbox']) == pytest.approx(r_box, rel=1e-3)
    assert float(o['loss_dfl']) == pytest.approx(r_dfl, rel=1e-3)


def test_fcos_loss_parity():
    import torch
    refbridge.install()
    from mmcv.utils import ConfigDict
    from mmdet.models.dense_heads.fcos_head import FCOSHead as Ref
    from swindet_tpu.models.builder import build_head

    common = dict(num_classes=4, in_channels=8, feat_channels=8,
                  stacked_convs=1, strides=STRIDES,
                  regress_ranges=((-1, 24), (24, 48), (48, 1e8)),
                  loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                                gamma=2.0, alpha=0.25, loss_weight=1.0),
                  loss_bbox=dict(type='IoULoss', loss_weight=1.0),
                  loss_centerness=dict(type='CrossEntropyLoss',
                                       use_sigmoid=True, loss_weight=1.0))
    ref = Ref(norm_cfg=None, **common)
    ref.train_cfg = None

    rs = np.random.RandomState(3)
    cls_maps = [rs.randn(B, 4, sh, sw).astype(np.float32)
                for sh, sw in SIZES]
    # positive distances (reference applies exp/scale inside forward;
    # loss consumes raw positive ltrb)
    box_maps = [np.abs(rs.randn(B, 4, sh, sw)).astype(np.float32) * 10
                for sh, sw in SIZES]
    ctr_maps = [rs.randn(B, 1, sh, sw).astype(np.float32)
                for sh, sw in SIZES]
    gt, labels = _gts(rs)
    r = ref.loss([torch.tensor(m) for m in cls_maps],
                 [torch.tensor(m) for m in box_maps],
                 [torch.tensor(m) for m in ctr_maps],
                 [torch.tensor(gt[i]) for i in range(B)],
                 [torch.tensor(labels[i].astype(np.int64))
                  for i in range(B)], _meta())

    ours = build_head(dict(type='FCOSHead', **common))
    variables = ours.init(
        jax.random.PRNGKey(0),
        [jnp.zeros((1, sh, sw, 8)) for sh, sw in SIZES])
    o = _run_ours(ours, variables,
                  (_nhwc(cls_maps), _nhwc(box_maps), _nhwc(ctr_maps)),
                  gt, labels)
    assert float(o['loss_cls']) == pytest.approx(float(r['loss_cls']),
                                                 rel=1e-4)
    assert float(o['loss_bbox']) == pytest.approx(float(r['loss_bbox']),
                                                  rel=1e-3)
    assert float(o['loss_centerness']) == pytest.approx(
        float(r['loss_centerness']), rel=1e-4)
