"""SABLHead (two-stage bucketing bbox head): forward_train losses
finite, simple_test shapes, cascade variant (reference:
roi_heads/bbox_heads/sabl_head.py, configs/sabl/sabl_{faster,cascade}_
rcnn_r50_fpn_1x_coco.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from swindet_tpu.models import build_detector

from tests.test_models.test_fast_groie import _rcnn_cfgs
from tests.test_models.test_forward import demo_inputs


def _sabl_head(scale_factor=1.7):
    return dict(
        type='SABLHead', num_classes=4,
        cls_in_channels=16, reg_in_channels=16, roi_feat_size=7,
        reg_feat_up_ratio=2, reg_pre_kernel=3, reg_post_kernel=3,
        reg_pre_num=2, reg_post_num=1, cls_out_channels=32,
        reg_offset_out_channels=16, reg_cls_out_channels=16,
        num_cls_fcs=1, num_reg_fcs=0, reg_class_agnostic=True,
        norm_cfg=None,
        bbox_coder=dict(type='BucketingBBoxCoder', num_buckets=14,
                        scale_factor=scale_factor),
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                      loss_weight=1.0),
        loss_bbox_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                           loss_weight=1.0),
        loss_bbox_reg=dict(type='SmoothL1Loss', beta=0.1,
                           loss_weight=1.0))


def _rpn():
    return dict(
        type='RPNHead', in_channels=16, feat_channels=16,
        anchor_generator=dict(type='AnchorGenerator', scales=[8],
                              ratios=[0.5, 1.0, 2.0],
                              strides=[4, 8, 16, 32, 64]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0., 0., 0., 0.],
                        target_stds=[1., 1., 1., 1.]),
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                      loss_weight=1.0),
        loss_bbox=dict(type='L1Loss', loss_weight=1.0))


def _train_test_cfgs():
    train_cfg, test_cfg = _rcnn_cfgs()
    train_cfg['rpn'] = dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                      neg_iou_thr=0.3, min_pos_iou=0.3,
                      ignore_iof_thr=-1),
        sampler=dict(type='RandomSampler', num=32, pos_fraction=0.5,
                     neg_pos_ub=-1, add_gt_as_proposals=False),
        allowed_border=-1, pos_weight=-1)
    train_cfg['rpn_proposal'] = dict(
        nms_pre=64, max_per_img=32,
        nms=dict(type='nms', iou_threshold=0.7), min_bbox_size=0)
    test_cfg['rpn'] = dict(nms_pre=64, max_per_img=32,
                           nms=dict(type='nms', iou_threshold=0.7),
                           min_bbox_size=0)
    return train_cfg, test_cfg


def _backbone_neck():
    return (dict(type='ResNet', depth=18, base_channels=16,
                 out_indices=(0, 1, 2, 3)),
            dict(type='FPN', in_channels=[16, 32, 64, 128],
                 out_channels=16, num_outs=5))


def _run(model):
    batch = demo_inputs(b=2, h=64, w=64, with_mask=False)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'], method='forward_dummy')
    losses = model.apply(
        variables, batch['img'], batch['img_shapes'],
        batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
        batch['gt_labels'], method='forward_train',
        rngs={'sampling': jax.random.PRNGKey(2)})
    total = sum(float(v) for k, v in losses.items() if 'loss' in k)
    assert np.isfinite(total), losses
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)
    assert np.all(np.isfinite(np.asarray(out['dets'])))
    return losses


def test_sabl_faster_rcnn_forward():
    train_cfg, test_cfg = _train_test_cfgs()
    backbone, neck = _backbone_neck()
    model = build_detector(dict(
        type='FasterRCNN', backbone=backbone, neck=neck,
        rpn_head=_rpn(),
        roi_head=dict(
            type='StandardRoIHead',
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=7,
                               sampling_ratio=0),
                out_channels=16, featmap_strides=[4, 8, 16, 32]),
            bbox_head=_sabl_head()),
        train_cfg=train_cfg, test_cfg=test_cfg))
    losses = _run(model)
    for k in ('loss_cls', 'loss_bbox_cls', 'loss_bbox_reg'):
        assert k in losses, sorted(losses)


def test_sabl_cascade_rcnn_forward():
    train_cfg, test_cfg = _train_test_cfgs()
    rcnn_stage = dict(train_cfg['rcnn'])
    train_cfg['rcnn'] = [dict(rcnn_stage) for _ in range(3)]
    backbone, neck = _backbone_neck()
    model = build_detector(dict(
        type='CascadeRCNN', backbone=backbone, neck=neck,
        rpn_head=_rpn(),
        roi_head=dict(
            type='CascadeRoIHead',
            num_stages=3, stage_loss_weights=[1, 0.5, 0.25],
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=7,
                               sampling_ratio=0),
                out_channels=16, featmap_strides=[4, 8, 16, 32]),
            bbox_head=[_sabl_head(1.7), _sabl_head(1.5),
                       _sabl_head(1.3)]),
        train_cfg=train_cfg, test_cfg=test_cfg))
    losses = _run(model)
    assert 's2.loss_bbox_cls' in losses, sorted(losses)
