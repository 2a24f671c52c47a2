"""Training-loss parity for SAMPLING-FREE dense heads: identical
synthetic predictions + gts → identical loss values vs the reference
torch heads (no RNG involved: MaxIoU assign + PseudoSampler + focal /
hard-negative mining are deterministic).

- RetinaHead: full-set masked anchor targets + FocalLoss
  (reference anchor_head.py:426 loss, retina head cfg).
- SSDHead: hard-negative mining top-k re-expressed as a rank test
  (reference ssd_head.py loss_single)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')


def _gts(rs, b, g, h, w):
    gt = np.zeros((b, g, 4), np.float32)
    gt[..., 0] = rs.rand(b, g) * (w - 40)
    gt[..., 1] = rs.rand(b, g) * (h - 40)
    gt[..., 2] = gt[..., 0] + 8 + rs.rand(b, g) * 30
    gt[..., 3] = gt[..., 1] + 8 + rs.rand(b, g) * 30
    labels = rs.randint(0, 4, (b, g))
    return gt, labels


def test_retina_loss_parity():
    import torch
    refbridge.install()
    from mmcv.utils import ConfigDict
    from mmdet.models.dense_heads.retina_head import RetinaHead as Ref
    from swindet_tpu.models.builder import build_head

    h = w = 64
    strides = [8, 16, 32]
    sizes = [(8, 8), (4, 4), (2, 2)]
    anchor_cfg = dict(type='AnchorGenerator', octave_base_scale=4,
                      scales_per_octave=2, ratios=[0.5, 1.0, 2.0],
                      strides=strides)
    coder_cfg = dict(type='DeltaXYWHBBoxCoder',
                     target_means=[.0, .0, .0, .0],
                     target_stds=[1.0, 1.0, 1.0, 1.0])
    train_cfg = dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                      neg_iou_thr=0.4, min_pos_iou=0,
                      ignore_iof_thr=-1),
        allowed_border=-1, pos_weight=-1, debug=False)
    common = dict(num_classes=4, in_channels=8, feat_channels=8,
                  stacked_convs=1, anchor_generator=anchor_cfg,
                  bbox_coder=coder_cfg,
                  loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                                gamma=2.0, alpha=0.25, loss_weight=1.0),
                  loss_bbox=dict(type='L1Loss', loss_weight=1.0))

    ref = Ref(train_cfg=ConfigDict(train_cfg), **common)
    na = 6  # anchors per cell
    rs = np.random.RandomState(0)
    b, g = 2, 5
    cls_maps = [rs.randn(b, na * 4, sh, sw).astype(np.float32)
                for sh, sw in sizes]
    box_maps = [rs.randn(b, na * 4, sh, sw).astype(np.float32) * 0.3
                for sh, sw in sizes]
    gt, labels = _gts(rs, b, g, h, w)
    img_metas = [dict(img_shape=(h, w, 3), pad_shape=(h, w, 3))
                 for _ in range(b)]
    r = ref.loss([torch.tensor(m) for m in cls_maps],
                 [torch.tensor(m) for m in box_maps],
                 [torch.tensor(gt[i]) for i in range(b)],
                 [torch.tensor(labels[i].astype(np.int64))
                  for i in range(b)],
                 img_metas)
    r_cls = sum(float(v) for v in r['loss_cls'])
    r_box = sum(float(v) for v in r['loss_bbox'])

    ours = build_head(dict(type='RetinaHead', train_cfg=train_cfg,
                           **common))
    variables = ours.init(
        jax.random.PRNGKey(0),
        [jnp.zeros((1, sh, sw, 8)) for sh, sw in sizes])
    # NCHW (B, A*4, H, W) → NHWC: the box dim stays anchor-major
    o = ours.apply(
        variables,
        jax.random.PRNGKey(1),
        [jnp.asarray(m.transpose(0, 2, 3, 1)) for m in cls_maps],
        [jnp.asarray(m.transpose(0, 2, 3, 1)) for m in box_maps],
        jnp.asarray(gt), jnp.ones((b, g), bool),
        jnp.asarray(labels.astype(np.int32)),
        jnp.asarray([[h, w]] * b, jnp.int32),
        jnp.asarray([[h, w]] * b, jnp.int32),
        method='loss')
    assert float(o['loss_cls']) == pytest.approx(r_cls, rel=1e-4)
    assert float(o['loss_bbox']) == pytest.approx(r_box, rel=1e-4)


def test_ssd_loss_parity():
    import torch
    refbridge.install()
    from mmcv.utils import ConfigDict
    from mmdet.models.dense_heads.ssd_head import SSDHead as Ref
    from swindet_tpu.models.builder import build_head

    h = w = 64
    strides = [8, 16, 32]
    sizes = [(8, 8), (4, 4), (2, 2)]
    anchor_cfg = dict(type='SSDAnchorGenerator', scale_major=False,
                      input_size=300, basesize_ratio_range=(0.15, 0.9),
                      strides=strides, ratios=[[2], [2, 3], [2]])
    coder_cfg = dict(type='DeltaXYWHBBoxCoder',
                     target_means=[.0, .0, .0, .0],
                     target_stds=[0.1, 0.1, 0.2, 0.2])
    train_cfg = dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                      neg_iou_thr=0.5, min_pos_iou=0.,
                      ignore_iof_thr=-1, gt_max_assign_all=False),
        smoothl1_beta=1., allowed_border=-1, pos_weight=-1,
        neg_pos_ratio=3, debug=False)
    in_ch = (8, 8, 8)

    ref = Ref(num_classes=4, in_channels=in_ch,
              anchor_generator=ConfigDict(anchor_cfg),
              bbox_coder=ConfigDict(coder_cfg),
              train_cfg=ConfigDict(train_cfg))
    nas = ref.anchor_generator.num_base_anchors
    rs = np.random.RandomState(1)
    b, g = 2, 5
    cls_maps = [rs.randn(b, na * 5, sh, sw).astype(np.float32)
                for na, (sh, sw) in zip(nas, sizes)]
    box_maps = [rs.randn(b, na * 4, sh, sw).astype(np.float32) * 0.3
                for na, (sh, sw) in zip(nas, sizes)]
    gt, labels = _gts(rs, b, g, h, w)
    img_metas = [dict(img_shape=(h, w, 3), pad_shape=(h, w, 3))
                 for _ in range(b)]
    r = ref.loss([torch.tensor(m) for m in cls_maps],
                 [torch.tensor(m) for m in box_maps],
                 [torch.tensor(gt[i]) for i in range(b)],
                 [torch.tensor(labels[i].astype(np.int64))
                  for i in range(b)],
                 img_metas)
    r_cls = sum(float(v) for v in r['loss_cls'])
    r_box = sum(float(v) for v in r['loss_bbox'])

    ours = build_head(dict(type='SSDHead', num_classes=4,
                           in_channels=in_ch,
                           anchor_generator=anchor_cfg,
                           bbox_coder=coder_cfg, train_cfg=train_cfg))
    variables = ours.init(
        jax.random.PRNGKey(0),
        [jnp.zeros((1, sh, sw, c)) for (sh, sw), c in
         zip(sizes, in_ch)])
    o = ours.apply(
        variables,
        jax.random.PRNGKey(1),
        [jnp.asarray(m.transpose(0, 2, 3, 1)) for m in cls_maps],
        [jnp.asarray(m.transpose(0, 2, 3, 1)) for m in box_maps],
        jnp.asarray(gt), jnp.ones((b, g), bool),
        jnp.asarray(labels.astype(np.int32)),
        jnp.asarray([[h, w]] * b, jnp.int32),
        jnp.asarray([[h, w]] * b, jnp.int32),
        method='loss')
    assert float(o['loss_cls']) == pytest.approx(r_cls, rel=1e-4)
    assert float(o['loss_bbox']) == pytest.approx(r_box, rel=1e-4)
