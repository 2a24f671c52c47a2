"""FastRCNN (precomputed proposals) and GenericRoIExtractor (GRoIE)
end-to-end: build, forward_train loss-finite, simple_test shapes."""
import numpy as np
import jax
import jax.numpy as jnp

from swindet_tpu.models import build_detector

from tests.test_models.test_forward import demo_inputs


def _rcnn_cfgs(num=8):
    train = dict(rcnn=dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                      neg_iou_thr=0.5, min_pos_iou=0.5,
                      match_low_quality=False, ignore_iof_thr=-1),
        sampler=dict(type='RandomSampler', num=num, pos_fraction=0.25,
                     neg_pos_ub=-1, add_gt_as_proposals=True),
        pos_weight=-1))
    test = dict(rcnn=dict(score_thr=0.05,
                          nms=dict(type='nms', iou_threshold=0.5),
                          max_per_img=16))
    return train, test


def tiny_fast_rcnn_cfg():
    train_cfg, test_cfg = _rcnn_cfgs()
    return dict(
        type='FastRCNN',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(0, 1, 2, 3)),
        neck=dict(type='FPN', in_channels=[16, 32, 64, 128],
                  out_channels=16, num_outs=5),
        roi_head=dict(
            type='StandardRoIHead',
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=7,
                               sampling_ratio=0),
                out_channels=16, featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(
                type='Shared2FCBBoxHead', in_channels=16,
                fc_out_channels=32, roi_feat_size=7, num_classes=4,
                bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                target_means=[0., 0., 0., 0.],
                                target_stds=[0.1, 0.1, 0.2, 0.2]),
                loss_cls=dict(type='CrossEntropyLoss'),
                loss_bbox=dict(type='L1Loss', loss_weight=1.0))),
        train_cfg=train_cfg, test_cfg=test_cfg)


def test_fast_rcnn_forward():
    model = build_detector(tiny_fast_rcnn_cfg())
    batch = demo_inputs(b=2, h=64, w=64, with_mask=False)
    # precomputed proposals: jittered copies of the gt plus noise boxes
    props = np.zeros((2, 12, 4), np.float32)
    pvalid = np.zeros((2, 12), np.float32)
    rng = np.random.RandomState(0)
    gtb = np.asarray(batch['gt_bboxes'])
    gtv = np.asarray(batch['gt_valid'])
    for b in range(2):
        n = 0
        for g in range(gtb.shape[1]):
            if gtv[b, g] > 0:
                for _ in range(3):
                    props[b, n] = gtb[b, g] + rng.uniform(-3, 3, 4)
                    pvalid[b, n] = 1.0
                    n += 1
        while n < 8:
            x1, y1 = rng.uniform(0, 40, 2)
            props[b, n] = [x1, y1, x1 + rng.uniform(8, 20),
                           y1 + rng.uniform(8, 20)]
            pvalid[b, n] = 1.0
            n += 1
    props = jnp.clip(jnp.asarray(props), 0, 63)
    pvalid = jnp.asarray(pvalid) > 0

    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'], method='forward_dummy')
    losses = model.apply(
        variables, batch['img'], batch['img_shapes'],
        batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
        batch['gt_labels'], props, pvalid, method='forward_train',
        rngs={'sampling': jax.random.PRNGKey(2)})
    for k in ('loss_cls', 'loss_bbox'):
        assert np.isfinite(float(losses[k])), k
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32), props, pvalid,
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)
    assert np.all(np.isfinite(np.asarray(out['dets'])))


def tiny_groie_faster_cfg():
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
    return dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(0, 1, 2, 3)),
        neck=dict(type='FPN', in_channels=[16, 32, 64, 128],
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
            loss_bbox=dict(type='L1Loss', loss_weight=1.0)),
        roi_head=dict(
            type='StandardRoIHead',
            bbox_roi_extractor=dict(
                type='GenericRoIExtractor', aggregation='sum',
                roi_layer=dict(type='RoIAlign', output_size=7,
                               sampling_ratio=2),
                out_channels=16, featmap_strides=[4, 8, 16, 32],
                pre_cfg=dict(type='ConvModule', in_channels=16,
                             out_channels=16, kernel_size=5, padding=2,
                             inplace=False),
                post_cfg=dict(type='GeneralizedAttention',
                              in_channels=16, spatial_range=-1,
                              num_heads=4, attention_type='0100',
                              kv_stride=2)),
            bbox_head=dict(
                type='Shared2FCBBoxHead', in_channels=16,
                fc_out_channels=32, roi_feat_size=7, num_classes=4,
                bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                target_means=[0., 0., 0., 0.],
                                target_stds=[0.1, 0.1, 0.2, 0.2]),
                loss_cls=dict(type='CrossEntropyLoss'),
                loss_bbox=dict(type='L1Loss', loss_weight=1.0))),
        train_cfg=train_cfg, test_cfg=test_cfg)


def test_groie_faster_rcnn_forward():
    model = build_detector(tiny_groie_faster_cfg())
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
    total = sum(float(v) for v in losses.values())
    assert np.isfinite(total)
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)


def tiny_trident_cfg():
    norm_cfg = dict(type='BN', requires_grad=False)
    return dict(
        type='TridentFasterRCNN',
        backbone=dict(type='TridentResNet', depth=50, base_channels=8,
                      num_branch=3, test_branch_idx=1,
                      trident_dilations=(1, 2, 3), num_stages=3,
                      out_indices=(2,)),
        rpn_head=dict(
            type='RPNHead', in_channels=128, feat_channels=32,
            anchor_generator=dict(type='AnchorGenerator',
                                  scales=[2, 4], ratios=[0.5, 1.0, 2.0],
                                  strides=[16]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0., 0., 0., 0.],
                            target_stds=[1., 1., 1., 1.]),
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                          loss_weight=1.0),
            loss_bbox=dict(type='L1Loss', loss_weight=1.0)),
        roi_head=dict(
            type='TridentRoIHead', num_branch=3, test_branch_idx=1,
            shared_head=dict(type='ResLayer', depth=50, stage=3,
                             stride=2, dilation=1, norm_cfg=norm_cfg,
                             base_channels=8),
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=14,
                               sampling_ratio=0),
                out_channels=128, featmap_strides=[16]),
            bbox_head=dict(
                type='BBoxHead', with_avg_pool=True, roi_feat_size=7,
                in_channels=256, num_classes=4,
                bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                target_means=[0., 0., 0., 0.],
                                target_stds=[0.1, 0.1, 0.2, 0.2]),
                loss_cls=dict(type='CrossEntropyLoss'),
                loss_bbox=dict(type='L1Loss', loss_weight=1.0))),
        train_cfg=dict(
            rpn=dict(
                assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                              neg_iou_thr=0.3, min_pos_iou=0.3,
                              match_low_quality=True,
                              ignore_iof_thr=-1),
                sampler=dict(type='RandomSampler', num=32,
                             pos_fraction=0.5, neg_pos_ub=-1,
                             add_gt_as_proposals=False),
                allowed_border=0, pos_weight=-1),
            rpn_proposal=dict(nms_pre=64, max_per_img=24,
                              nms=dict(type='nms', iou_threshold=0.7),
                              min_bbox_size=0),
            rcnn=dict(
                assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                              neg_iou_thr=0.5, min_pos_iou=0.5,
                              match_low_quality=False,
                              ignore_iof_thr=-1),
                sampler=dict(type='RandomSampler', num=16,
                             pos_fraction=0.25, neg_pos_ub=-1,
                             add_gt_as_proposals=True),
                pos_weight=-1)),
        test_cfg=dict(
            rpn=dict(nms_pre=64, max_per_img=24,
                     nms=dict(type='nms', iou_threshold=0.7),
                     min_bbox_size=0),
            rcnn=dict(score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=16)))


def test_trident_faster_rcnn_forward():
    """Trident branches fold into the batch axis at train time (gts
    tiled x3); test runs the single test_branch_idx branch."""
    model = build_detector(tiny_trident_cfg())
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
    for k in ('loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls', 'loss_bbox'):
        assert np.isfinite(float(losses[k])), k
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)
    assert np.all(np.isfinite(np.asarray(out['dets'])))


def tiny_mask_c4_cfg():
    """C4-style Mask R-CNN: shared ResLayer feeds BOTH the bbox and
    mask branches (reference: _base_/models/mask_rcnn_r50_caffe_c4.py
    mask_roi_extractor=None)."""
    norm_cfg = dict(type='BN', requires_grad=False)
    return dict(
        type='MaskRCNN',
        backbone=dict(type='ResNet', depth=50, base_channels=8,
                      num_stages=3, strides=(1, 2, 2),
                      dilations=(1, 1, 1), out_indices=(2,),
                      style='caffe'),
        rpn_head=dict(
            type='RPNHead', in_channels=128, feat_channels=32,
            anchor_generator=dict(type='AnchorGenerator',
                                  scales=[2, 4], ratios=[0.5, 1.0, 2.0],
                                  strides=[16]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0., 0., 0., 0.],
                            target_stds=[1., 1., 1., 1.]),
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                          loss_weight=1.0),
            loss_bbox=dict(type='L1Loss', loss_weight=1.0)),
        roi_head=dict(
            type='StandardRoIHead',
            shared_head=dict(type='ResLayer', depth=50, stage=3,
                             stride=2, dilation=1, norm_cfg=norm_cfg,
                             base_channels=8, style='caffe'),
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=14,
                               sampling_ratio=0),
                out_channels=128, featmap_strides=[16]),
            bbox_head=dict(
                type='BBoxHead', with_avg_pool=True, roi_feat_size=7,
                in_channels=256, num_classes=4,
                bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                target_means=[0., 0., 0., 0.],
                                target_stds=[0.1, 0.1, 0.2, 0.2]),
                loss_cls=dict(type='CrossEntropyLoss'),
                loss_bbox=dict(type='L1Loss', loss_weight=1.0)),
            mask_roi_extractor=None,
            mask_head=dict(
                type='FCNMaskHead', num_convs=0, in_channels=256,
                conv_out_channels=32, num_classes=4,
                loss_mask=dict(type='CrossEntropyLoss', use_mask=True,
                               loss_weight=1.0))),
        train_cfg=dict(
            rpn=dict(
                assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                              neg_iou_thr=0.3, min_pos_iou=0.3,
                              match_low_quality=True,
                              ignore_iof_thr=-1),
                sampler=dict(type='RandomSampler', num=32,
                             pos_fraction=0.5, neg_pos_ub=-1,
                             add_gt_as_proposals=False),
                allowed_border=0, pos_weight=-1),
            rpn_proposal=dict(nms_pre=64, max_per_img=24,
                              nms=dict(type='nms', iou_threshold=0.7),
                              min_bbox_size=0),
            rcnn=dict(
                assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                              neg_iou_thr=0.5, min_pos_iou=0.5,
                              match_low_quality=False,
                              ignore_iof_thr=-1),
                sampler=dict(type='RandomSampler', num=16,
                             pos_fraction=0.25, neg_pos_ub=-1,
                             add_gt_as_proposals=True),
                mask_size=14, pos_weight=-1)),
        test_cfg=dict(
            rpn=dict(nms_pre=64, max_per_img=24,
                     nms=dict(type='nms', iou_threshold=0.7),
                     min_bbox_size=0),
            rcnn=dict(score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=16, mask_thr_binary=0.5)))


def test_mask_c4_shared_head_forward():
    model = build_detector(tiny_mask_c4_cfg())
    batch = demo_inputs(b=2, h=64, w=64, with_mask=True)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'], method='forward_dummy')
    losses = model.apply(
        variables, batch['img'], batch['img_shapes'],
        batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
        batch['gt_labels'], gt_masks=batch['gt_masks'],
        method='forward_train',
        rngs={'sampling': jax.random.PRNGKey(2)})
    for k in ('loss_cls', 'loss_bbox', 'loss_mask'):
        assert np.isfinite(float(losses[k])), (k, losses)
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)
    assert 'mask_probs' in out
