"""Training-loss parity, wave 3: FreeAnchor (bag likelihood — fully
deterministic) and YOLOv3 (responsible-anchor targets + confidence
ignore) vs the reference torch heads on identical predictions + gts."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')

H = W = 64
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


def test_free_anchor_loss_parity():
    import torch
    refbridge.install()
    from mmcv.utils import ConfigDict
    from mmdet.models.dense_heads.free_anchor_retina_head import \
        FreeAnchorRetinaHead as Ref
    from swindet_tpu.models.builder import build_head

    strides = [8, 16, 32]
    sizes = [(8, 8), (4, 4), (2, 2)]
    anchor_cfg = dict(type='AnchorGenerator', octave_base_scale=4,
                      scales_per_octave=2, ratios=[0.5, 1.0, 2.0],
                      strides=strides)
    coder_cfg = dict(type='DeltaXYWHBBoxCoder',
                     target_means=[.0, .0, .0, .0],
                     target_stds=[1.0, 1.0, 1.0, 1.0])
    common = dict(num_classes=4, in_channels=8, feat_channels=8,
                  stacked_convs=1, anchor_generator=anchor_cfg,
                  bbox_coder=coder_cfg, pre_anchor_topk=12,
                  bbox_thr=0.4, gamma=2.0, alpha=0.5,
                  loss_bbox=dict(type='SmoothL1Loss', beta=0.11,
                                 loss_weight=0.75))
    ref = Ref(**common)
    # the reference's loss calls grid_anchors without a device (default
    # 'cuda', free_anchor_retina_head.py:81) — pin to cpu
    _orig = ref.anchor_generator.grid_anchors
    ref.anchor_generator.grid_anchors = \
        lambda sizes, device='cpu': _orig(sizes, 'cpu')
    _origv = ref.anchor_generator.valid_flags
    ref.anchor_generator.valid_flags = \
        lambda sizes, pad, device='cpu': _origv(sizes, pad, 'cpu')

    na = 6
    rs = np.random.RandomState(0)
    cls_maps = [rs.randn(B, na * 4, sh, sw).astype(np.float32)
                for sh, sw in sizes]
    box_maps = [rs.randn(B, na * 4, sh, sw).astype(np.float32) * 0.3
                for sh, sw in sizes]
    gt, labels = _gts(rs)
    metas = [dict(img_shape=(H, W, 3), pad_shape=(H, W, 3))
             for _ in range(B)]
    r = ref.loss([torch.tensor(m) for m in cls_maps],
                 [torch.tensor(m) for m in box_maps],
                 [torch.tensor(gt[i]) for i in range(B)],
                 [torch.tensor(labels[i].astype(np.int64))
                  for i in range(B)], metas)
    r_pos = float(r['positive_bag_loss'])
    r_neg = float(r['negative_bag_loss'])

    ours = build_head(dict(type='FreeAnchorRetinaHead', **common))
    variables = ours.init(
        jax.random.PRNGKey(0),
        [jnp.zeros((1, sh, sw, 8)) for sh, sw in sizes])
    o = ours.apply(
        variables, jax.random.PRNGKey(1),
        _nhwc(cls_maps), _nhwc(box_maps),
        jnp.asarray(gt), jnp.ones((B, G), bool),
        jnp.asarray(labels.astype(np.int32)),
        jnp.asarray([[H, W]] * B, jnp.int32),
        jnp.asarray([[H, W]] * B, jnp.int32),
        method='loss')
    keys = sorted(o)
    pos_key = [k for k in keys if 'pos' in k][0]
    neg_key = [k for k in keys if 'neg' in k][0]
    # the anchor grid produces EXACT IoU ties at the pre_anchor_topk
    # boundary (translation-symmetric anchors inside a gt); torch.topk
    # breaks ties by an arbitrary order, ours by lowest index — both
    # are valid top-k sets, so the bag losses agree only to the tie
    # perturbation (~2%)
    assert float(o[pos_key]) == pytest.approx(r_pos, rel=0.05)
    assert float(o[neg_key]) == pytest.approx(r_neg, rel=0.05)


def test_yolov3_loss_parity():
    import torch
    refbridge.install()
    from mmcv.utils import ConfigDict
    from mmdet.models.dense_heads.yolo_head import YOLOV3Head as Ref
    from swindet_tpu.models.builder import build_head

    strides = [32, 16, 8]
    sizes = [(2, 2), (4, 4), (8, 8)]
    anchor_cfg = dict(type='YOLOAnchorGenerator',
                      base_sizes=[[(20, 15), (30, 30)],
                                  [(10, 8), (16, 16)],
                                  [(4, 5), (8, 6)]],
                      strides=strides)
    common = dict(num_classes=4,
                  in_channels=[8, 8, 8], out_channels=[8, 8, 8],
                  anchor_generator=anchor_cfg,
                  bbox_coder=dict(type='YOLOBBoxCoder'),
                  featmap_strides=strides,
                  # the yolov3 config's loss settings (sum reduction)
                  loss_cls=dict(type='CrossEntropyLoss',
                                use_sigmoid=True, loss_weight=1.0,
                                reduction='sum'),
                  loss_conf=dict(type='CrossEntropyLoss',
                                 use_sigmoid=True, loss_weight=1.0,
                                 reduction='sum'),
                  loss_xy=dict(type='CrossEntropyLoss',
                               use_sigmoid=True, loss_weight=2.0,
                               reduction='sum'),
                  loss_wh=dict(type='MSELoss', loss_weight=2.0,
                               reduction='sum'))
    train_cfg = dict(assigner=dict(
        type='GridAssigner', pos_iou_thr=0.5, neg_iou_thr=0.5,
        min_pos_iou=0))
    ref = Ref(train_cfg=ConfigDict(train_cfg), **common)

    na = 2
    attrib = 5 + 4
    rs = np.random.RandomState(1)
    pred_maps = [rs.randn(B, na * attrib, sh, sw).astype(np.float32)
                 for sh, sw in sizes]
    gt, labels = _gts(rs)
    metas = [dict(img_shape=(H, W, 3), pad_shape=(H, W, 3))
             for _ in range(B)]
    r = ref.loss([torch.tensor(m) for m in pred_maps],
                 [torch.tensor(gt[i]) for i in range(B)],
                 [torch.tensor(labels[i].astype(np.int64))
                  for i in range(B)], metas)
    r_cls = sum(float(v) for v in r['loss_cls'])
    r_conf = sum(float(v) for v in r['loss_conf'])
    r_xy = sum(float(v) for v in r['loss_xy'])
    r_wh = sum(float(v) for v in r['loss_wh'])

    ours = build_head(dict(type='YOLOV3Head', train_cfg=train_cfg,
                           **common))
    variables = ours.init(
        jax.random.PRNGKey(0),
        [jnp.zeros((1, sh, sw, 8)) for sh, sw in sizes])
    o = ours.apply(
        variables, jax.random.PRNGKey(1),
        _nhwc(pred_maps),
        jnp.asarray(gt), jnp.ones((B, G), bool),
        jnp.asarray(labels.astype(np.int32)),
        jnp.asarray([[H, W]] * B, jnp.int32),
        jnp.asarray([[H, W]] * B, jnp.int32),
        method='loss')
    assert float(o['loss_cls']) == pytest.approx(r_cls, rel=1e-3)
    assert float(o['loss_conf']) == pytest.approx(r_conf, rel=1e-3)
    assert float(o['loss_xy']) == pytest.approx(r_xy, rel=1e-3)
    assert float(o['loss_wh']) == pytest.approx(r_wh, rel=1e-3)
