"""Cascade Mask R-CNN forward test (3-stage refinement, stage score
averaging, mask merging — reference: cascade_roi_head.py:13)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swindet_tpu.models import build_detector

from tests.test_models.test_forward import demo_inputs


def _stage_bbox_head(stds):
    return dict(
        type='Shared2FCBBoxHead', in_channels=16, fc_out_channels=32,
        roi_feat_size=7, num_classes=4,
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0., 0., 0., 0.],
                        target_stds=list(stds)),
        reg_class_agnostic=True,
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                      loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=1.0, loss_weight=1.0))


def _stage_rcnn_cfg(pos_iou):
    return dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=pos_iou,
                      neg_iou_thr=pos_iou, min_pos_iou=pos_iou,
                      match_low_quality=False, ignore_iof_thr=-1),
        sampler=dict(type='RandomSampler', num=32, pos_fraction=0.25,
                     neg_pos_ub=-1, add_gt_as_proposals=True),
        mask_size=28, pos_weight=-1)


def tiny_cascade_cfg():
    return dict(
        type='CascadeRCNN',
        backbone=dict(type='SwinTransformer', embed_dim=32,
                      depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8],
                      window_size=7, drop_path_rate=0.0),
        neck=dict(type='FPN', in_channels=[32, 64, 128, 256],
                  out_channels=16, num_outs=5),
        rpn_head=dict(
            type='RPNHead', in_channels=16, feat_channels=16,
            anchor_generator=dict(type='AnchorGenerator', scales=[8],
                                  ratios=[0.5, 1.0, 2.0],
                                  strides=[4, 8, 16, 32, 64]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0., 0., 0., 0.],
                            target_stds=[1., 1., 1., 1.]),
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                          loss_weight=1.0),
            loss_bbox=dict(type='SmoothL1Loss', beta=1.0 / 9.0,
                           loss_weight=1.0)),
        roi_head=dict(
            type='CascadeRoIHead',
            num_stages=3,
            stage_loss_weights=[1, 0.5, 0.25],
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=7,
                               sampling_ratio=0),
                out_channels=16, featmap_strides=[4, 8, 16, 32]),
            bbox_head=[
                _stage_bbox_head([0.1, 0.1, 0.2, 0.2]),
                _stage_bbox_head([0.05, 0.05, 0.1, 0.1]),
                _stage_bbox_head([0.033, 0.033, 0.067, 0.067]),
            ],
            mask_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=14,
                               sampling_ratio=0),
                out_channels=16, featmap_strides=[4, 8, 16, 32]),
            mask_head=dict(
                type='FCNMaskHead', num_convs=1, in_channels=16,
                conv_out_channels=16, num_classes=4,
                loss_mask=dict(type='CrossEntropyLoss', use_mask=True,
                               loss_weight=1.0))),
        train_cfg=dict(
            rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                                   neg_iou_thr=0.3, min_pos_iou=0.3,
                                   match_low_quality=True,
                                   ignore_iof_thr=-1),
                     sampler=dict(type='RandomSampler', num=64,
                                  pos_fraction=0.5, neg_pos_ub=-1,
                                  add_gt_as_proposals=False),
                     allowed_border=-1, pos_weight=-1),
            rpn_proposal=dict(nms_pre=128, max_per_img=64,
                              nms=dict(type='nms', iou_threshold=0.7),
                              min_bbox_size=0),
            rcnn=[_stage_rcnn_cfg(0.5), _stage_rcnn_cfg(0.6),
                  _stage_rcnn_cfg(0.7)]),
        test_cfg=dict(
            rpn=dict(nms_pre=128, max_per_img=64,
                     nms=dict(type='nms', iou_threshold=0.7),
                     min_bbox_size=0),
            rcnn=dict(score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=16, mask_thr_binary=0.5)))


@pytest.fixture(scope='module')
def cascade_setup():
    model = build_detector(tiny_cascade_cfg())
    batch = demo_inputs(b=2, h=64, w=64)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'], method='forward_dummy')
    return model, variables, batch


def test_cascade_forward_train(cascade_setup):
    model, variables, batch = cascade_setup
    losses = model.apply(
        variables, batch['img'], batch['img_shapes'],
        batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
        batch['gt_labels'], batch['gt_masks'],
        method='forward_train',
        rngs={'sampling': jax.random.PRNGKey(2)})
    # per-stage losses present (s0/s1/s2)
    stage_keys = [k for k in losses if k.startswith('s0.') or
                  k.startswith('s1.') or k.startswith('s2.')]
    assert len(stage_keys) >= 6, losses.keys()
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'


def test_cascade_simple_test(cascade_setup):
    model, variables, batch = cascade_setup
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)
    assert out['mask_probs'].shape[:2] == (2, 16)
    assert np.all(np.isfinite(np.asarray(out['dets'])))


def tiny_htc_cfg(with_semantic=True):
    """HTC graph scaled tiny (reference: configs/htc/htc_r50_fpn_1x)."""
    base = tiny_cascade_cfg()
    rh = base['roi_head']
    rh['type'] = 'HybridTaskCascadeRoIHead'
    rh['interleaved'] = True
    rh['mask_info_flow'] = True
    mh = rh['mask_head']
    if not isinstance(mh, (list, tuple)):
        mh = [dict(mh) for _ in range(3)]
    for i, h in enumerate(mh):
        h['type'] = 'HTCMaskHead'
        h['with_conv_res'] = i > 0
    rh['mask_head'] = mh
    if with_semantic:
        out_ch = rh['bbox_roi_extractor']['out_channels']
        rh['semantic_roi_extractor'] = dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=14,
                           sampling_ratio=0),
            out_channels=out_ch, featmap_strides=[8])
        rh['semantic_head'] = dict(
            type='FusedSemanticHead', num_ins=5, fusion_level=1,
            num_convs=2, in_channels=out_ch, conv_out_channels=out_ch,
            num_classes=8, ignore_label=255, loss_weight=0.2)
    base['type'] = 'HybridTaskCascade'
    return base


def test_htc_forward():
    import numpy as np
    model = build_detector(tiny_htc_cfg())
    batch = demo_inputs(b=2, h=64, w=64)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'][:1], method='forward_dummy')
    seg = np.zeros((2, 8, 8), np.uint8)
    seg[:, 2:5, 2:5] = 3
    losses = model.apply(
        variables, batch['img'], batch['img_shapes'],
        batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
        batch['gt_labels'], batch['gt_masks'], jnp.asarray(seg),
        method='forward_train', rngs={'sampling': jax.random.PRNGKey(2)})
    assert 'loss_semantic_seg' in losses
    for s in range(3):
        assert f's{s}.loss_cls' in losses
        assert f's{s}.loss_mask' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape[0] == 2
    assert 'mask_probs' in out
    assert np.all(np.isfinite(np.asarray(out['dets'])))


def tiny_scnet_cfg():
    """SCNet graph scaled tiny (reference: configs/scnet/
    scnet_r50_fpn_1x_coco.py)."""
    base = tiny_cascade_cfg()
    rh = base['roi_head']
    rh['type'] = 'SCNetRoIHead'
    out_ch = rh['bbox_roi_extractor']['out_channels']
    for h in rh['bbox_head']:
        h['type'] = 'SCNetBBoxHead'
    rh['mask_head'] = dict(
        type='SCNetMaskHead', num_convs=2, in_channels=out_ch,
        conv_out_channels=out_ch, num_classes=4, conv_to_res=True,
        loss_mask=dict(type='CrossEntropyLoss', use_mask=True,
                       loss_weight=1.0))
    rh['semantic_roi_extractor'] = dict(
        type='SingleRoIExtractor',
        roi_layer=dict(type='RoIAlign', output_size=14,
                       sampling_ratio=0),
        out_channels=out_ch, featmap_strides=[8])
    rh['semantic_head'] = dict(
        type='SCNetSemanticHead', num_ins=5, fusion_level=1,
        num_convs=2, in_channels=out_ch, conv_out_channels=out_ch,
        num_classes=8, ignore_label=255, loss_weight=0.2)
    rh['glbctx_head'] = dict(
        type='GlobalContextHead', num_convs=2, in_channels=out_ch,
        conv_out_channels=out_ch, num_classes=4, loss_weight=3.0)
    rh['feat_relay_head'] = dict(
        type='FeatureRelayHead',
        in_channels=rh['bbox_head'][0]['fc_out_channels'],
        out_conv_channels=out_ch, roi_feat_size=7, scale_factor=2)
    base['type'] = 'SCNet'
    return base


def test_scnet_forward():
    import numpy as np
    model = build_detector(tiny_scnet_cfg())
    batch = demo_inputs(b=2, h=64, w=64)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'][:1], method='forward_dummy')
    seg = np.zeros((2, 8, 8), np.uint8)
    seg[:, 2:5, 2:5] = 3
    losses = model.apply(
        variables, batch['img'], batch['img_shapes'],
        batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
        batch['gt_labels'], batch['gt_masks'], jnp.asarray(seg),
        method='forward_train', rngs={'sampling': jax.random.PRNGKey(2)})
    assert 'loss_semantic_seg' in losses
    assert 'loss_glbctx' in losses
    assert 'loss_mask' in losses
    for s in range(3):
        assert f's{s}.loss_cls' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape[0] == 2
    assert 'mask_probs' in out
    assert np.all(np.isfinite(np.asarray(out['dets'])))
