"""GuidedAnchor family: GA-RPN (rpn-only + inside Faster R-CNN) and
GA-RetinaNet — build, forward_train loss-finite, simple_test shapes;
RegionAssigner semantics unit test."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swindet_tpu.models import build_detector

from tests.test_models.test_forward import demo_inputs


def _ga_rpn_head(strides=(8, 16, 32, 64, 128)):
    return dict(
        type='GARPNHead',
        in_channels=16,
        feat_channels=16,
        approx_anchor_generator=dict(
            type='AnchorGenerator', octave_base_scale=8,
            scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
            strides=list(strides)),
        square_anchor_generator=dict(
            type='AnchorGenerator', ratios=[1.0], scales=[8],
            strides=list(strides)),
        anchor_coder=dict(type='DeltaXYWHBBoxCoder',
                          target_means=[0., 0., 0., 0.],
                          target_stds=[0.07, 0.07, 0.14, 0.14]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0., 0., 0., 0.],
                        target_stds=[0.07, 0.07, 0.11, 0.11]),
        loc_filter_thr=0.01,
        loss_loc=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_shape=dict(type='BoundedIoULoss', beta=0.2,
                        loss_weight=1.0),
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                      loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=1.0, loss_weight=1.0))


def _ga_rpn_train_cfg():
    return dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                      neg_iou_thr=0.3, min_pos_iou=0.3,
                      ignore_iof_thr=-1),
        sampler=dict(type='RandomSampler', num=64, pos_fraction=0.5,
                     neg_pos_ub=-1, add_gt_as_proposals=False),
        ga_assigner=dict(type='ApproxMaxIoUAssigner', pos_iou_thr=0.7,
                         neg_iou_thr=0.3, min_pos_iou=0.3,
                         ignore_iof_thr=-1),
        ga_sampler=dict(type='RandomSampler', num=64, pos_fraction=0.5,
                        neg_pos_ub=-1, add_gt_as_proposals=False),
        allowed_border=-1, center_ratio=0.2, ignore_ratio=0.5,
        pos_weight=-1)


def tiny_ga_rpn_cfg():
    return dict(
        type='RPN',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(1, 2, 3)),
        neck=dict(type='FPN', in_channels=[32, 64, 128], out_channels=16,
                  start_level=0, add_extra_convs='on_input', num_outs=5),
        rpn_head=_ga_rpn_head(),
        train_cfg=dict(rpn=_ga_rpn_train_cfg()),
        test_cfg=dict(rpn=dict(nms_pre=64, max_per_img=32,
                               nms=dict(type='nms', iou_threshold=0.7),
                               min_bbox_size=0)))


def tiny_ga_faster_cfg():
    return dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(0, 1, 2, 3)),
        neck=dict(type='FPN', in_channels=[16, 32, 64, 128],
                  out_channels=16, num_outs=5),
        rpn_head=_ga_rpn_head(strides=(4, 8, 16, 32, 64)),
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
                                target_stds=[0.05, 0.05, 0.1, 0.1]),
                loss_cls=dict(type='CrossEntropyLoss'),
                loss_bbox=dict(type='SmoothL1Loss', beta=1.0,
                               loss_weight=1.0))),
        train_cfg=dict(
            rpn=_ga_rpn_train_cfg(),
            rpn_proposal=dict(nms_pre=64, max_per_img=32,
                              nms=dict(type='nms', iou_threshold=0.7),
                              min_bbox_size=0),
            rcnn=dict(
                assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.6,
                              neg_iou_thr=0.6, min_pos_iou=0.6,
                              match_low_quality=False,
                              ignore_iof_thr=-1),
                sampler=dict(type='RandomSampler', num=32,
                             pos_fraction=0.25, neg_pos_ub=-1,
                             add_gt_as_proposals=True),
                pos_weight=-1)),
        test_cfg=dict(
            rpn=dict(nms_pre=64, max_per_img=32,
                     nms=dict(type='nms', iou_threshold=0.7),
                     min_bbox_size=0),
            rcnn=dict(score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=16)))


def tiny_ga_retina_cfg():
    return dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(1, 2, 3)),
        neck=dict(type='FPN', in_channels=[32, 64, 128], out_channels=16,
                  start_level=0, add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(
            type='GARetinaHead', num_classes=4, in_channels=16,
            feat_channels=16, stacked_convs=1,
            approx_anchor_generator=dict(
                type='AnchorGenerator', octave_base_scale=4,
                scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                strides=[8, 16, 32, 64, 128]),
            square_anchor_generator=dict(
                type='AnchorGenerator', ratios=[1.0], scales=[4],
                strides=[8, 16, 32, 64, 128]),
            anchor_coder=dict(type='DeltaXYWHBBoxCoder',
                              target_means=[0., 0., 0., 0.],
                              target_stds=[1., 1., 1., 1.]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0., 0., 0., 0.],
                            target_stds=[1., 1., 1., 1.]),
            loss_loc=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0),
            loss_shape=dict(type='BoundedIoULoss', beta=0.2,
                            loss_weight=1.0),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0),
            loss_bbox=dict(type='SmoothL1Loss', beta=0.04,
                           loss_weight=1.0)),
        train_cfg=dict(
            ga_assigner=dict(type='ApproxMaxIoUAssigner',
                             pos_iou_thr=0.5, neg_iou_thr=0.4,
                             min_pos_iou=0.4, ignore_iof_thr=-1),
            ga_sampler=dict(type='RandomSampler', num=64,
                            pos_fraction=0.5, neg_pos_ub=-1,
                            add_gt_as_proposals=False),
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.5, min_pos_iou=0.0,
                          ignore_iof_thr=-1),
            allowed_border=-1, center_ratio=0.2, ignore_ratio=0.5,
            pos_weight=-1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=16))


def test_ga_rpn_forward():
    model = build_detector(tiny_ga_rpn_cfg())
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
    for k in ('loss_rpn_cls', 'loss_rpn_bbox', 'loss_anchor_shape',
              'loss_anchor_loc'):
        assert np.isfinite(float(losses[k])), f'{k} not finite'
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 32, 5)
    assert np.all(np.isfinite(np.asarray(out['dets'])))


def test_ga_faster_forward():
    model = build_detector(tiny_ga_faster_cfg())
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
    for k in ('loss_rpn_cls', 'loss_anchor_shape', 'loss_anchor_loc',
              'loss_cls', 'loss_bbox'):
        assert np.isfinite(float(losses[k])), f'{k} not finite'
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)


def test_ga_retina_forward():
    model = build_detector(tiny_ga_retina_cfg())
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
    for k in ('loss_cls', 'loss_bbox', 'loss_shape', 'loss_loc'):
        assert np.isfinite(float(losses[k])), f'{k} not finite'
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)


def test_region_assigner_semantics():
    """A gt paints positives at its routed level's center region and
    ignores on adjacent levels; outside anchors are -1."""
    from swindet_tpu.core.bbox.assigners import RegionAssigner
    strides = [8, 16]
    sizes = [(8, 8), (4, 4)]
    anchor_list = []
    for (h, w), s in zip(sizes, strides):
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
        cx = (xs.ravel() + 0.5) * s
        cy = (ys.ravel() + 0.5) * s
        half = 4 * s / 2
        anchor_list.append(jnp.asarray(np.stack(
            [cx - half, cy - half, cx + half, cy + half], -1),
            jnp.float32))
    # gt of scale 44 -> floor(log2(44/32)+0.5) = 0 -> level 0; its
    # r1-shrunk region [3,4]x[3,4] contains the center of cell 3 (3.5)
    gt = jnp.asarray([[8., 8., 52., 52.]], jnp.float32)
    res = RegionAssigner(0.2, 0.5).assign(
        anchor_list, sizes, strides, 4, gt, jnp.asarray([True]),
        gt_labels=jnp.asarray([2], jnp.int32))
    inds0 = np.asarray(res.gt_inds[:64]).reshape(8, 8)
    assert inds0[3, 3] == 1
    # ignore ring around it
    assert (inds0 == -1).any()
    # level 1 (adjacent) has ignores but no positives
    inds1 = np.asarray(res.gt_inds[64:]).reshape(4, 4)
    assert (inds1 != 1).all()
    assert (inds1 == -1).any()
    lab = np.asarray(res.labels[:64]).reshape(8, 8)
    assert lab[3, 3] == 2


def tiny_crpn_cfg():
    stage1 = dict(
        type='StageCascadeRPNHead', in_channels=16, feat_channels=16,
        anchor_generator=dict(type='AnchorGenerator', scales=[8],
                              ratios=[1.0],
                              strides=[8, 16, 32, 64, 128]),
        adapt_cfg=dict(type='dilation', dilation=3),
        bridged_feature=True, sampling=False, with_cls=False,
        reg_decoded_bbox=True,
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=(0., 0., 0., 0.),
                        target_stds=(0.1, 0.1, 0.5, 0.5)),
        loss_bbox=dict(type='IoULoss', linear=True, loss_weight=10.0))
    stage2 = dict(
        type='StageCascadeRPNHead', in_channels=16, feat_channels=16,
        anchor_generator=dict(type='AnchorGenerator', scales=[8],
                              ratios=[1.0],
                              strides=[8, 16, 32, 64, 128]),
        adapt_cfg=dict(type='offset'), bridged_feature=False,
        sampling=True, with_cls=True, reg_decoded_bbox=True,
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=(0., 0., 0., 0.),
                        target_stds=(0.05, 0.05, 0.1, 0.1)),
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                      loss_weight=1.0),
        loss_bbox=dict(type='IoULoss', linear=True, loss_weight=10.0))
    return dict(
        type='RPN',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(1, 2, 3)),
        neck=dict(type='FPN', in_channels=[32, 64, 128], out_channels=16,
                  start_level=0, add_extra_convs='on_input', num_outs=5),
        rpn_head=dict(type='CascadeRPNHead', num_stages=2,
                      stages=[stage1, stage2]),
        train_cfg=dict(rpn=[
            dict(assigner=dict(type='RegionAssigner', center_ratio=0.2,
                               ignore_ratio=0.5),
                 allowed_border=-1, pos_weight=-1),
            dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                               neg_iou_thr=0.7, min_pos_iou=0.3,
                               ignore_iof_thr=-1),
                 sampler=dict(type='RandomSampler', num=64,
                              pos_fraction=0.5, neg_pos_ub=-1,
                              add_gt_as_proposals=False),
                 allowed_border=-1, pos_weight=-1)]),
        test_cfg=dict(rpn=dict(nms_pre=64, max_per_img=32,
                               nms=dict(type='nms', iou_threshold=0.8),
                               min_bbox_size=0)))


def test_cascade_rpn_forward():
    model = build_detector(tiny_crpn_cfg())
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
    for k in ('s0.loss_rpn_reg', 's1.loss_rpn_cls', 's1.loss_rpn_reg'):
        assert np.isfinite(float(losses[k])), f'{k} not finite'
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 32, 5)
    assert np.all(np.isfinite(np.asarray(out['dets'])))
