"""END-TO-END golden parity, single-stage round 5: SABL-Retina
(bucketing coder decode) and GA-Retina (guided anchors: loc-masked
shape-adapted anchors) vs the reference torch models.

Reference call paths: mmdet/models/dense_heads/sabl_retina_head.py
get_bboxes (bucketing decode), guided_anchor_head.py get_bboxes
(loc_filter_thr masking + learned-shape anchors) with
ga_retina_head.py feature adaption (DeformConv + MaskedConv2d).
"""
import numpy as np
import pytest

from . import refbridge
from .common import (build_both, jax_to_result, make_image, match_dets,
                     run_jax_simple_test, run_ref_simple_test,
                     tiny_swin_backbone_cfg)

pytestmark = pytest.mark.skipif(not refbridge.reference_available(),
                                reason='reference checkout not mounted')

NUM_CLASSES = 4
HW = (64, 96)


def _neck():
    return dict(type='FPN', in_channels=[24, 48, 96, 192],
                out_channels=32, start_level=1,
                add_extra_convs='on_input', num_outs=5)


def tiny_sabl_retina_cfg():
    return dict(
        type='RetinaNet',
        pretrained=None,
        backbone=tiny_swin_backbone_cfg(),
        neck=_neck(),
        bbox_head=dict(
            type='SABLRetinaHead', num_classes=NUM_CLASSES,
            in_channels=32, feat_channels=32, stacked_convs=1,
            approx_anchor_generator=dict(
                type='AnchorGenerator', octave_base_scale=4,
                scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                strides=[8, 16, 32, 64, 128]),
            square_anchor_generator=dict(
                type='AnchorGenerator', ratios=[1.0], scales=[4],
                strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='BucketingBBoxCoder', num_buckets=14,
                            scale_factor=3.0),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                          gamma=2.0, alpha=0.25, loss_weight=1.0),
            loss_bbox_cls=dict(type='CrossEntropyLoss',
                               use_sigmoid=True, loss_weight=1.5),
            loss_bbox_reg=dict(type='SmoothL1Loss', beta=1.0 / 9.0,
                               loss_weight=1.5)),
        train_cfg=dict(
            assigner=dict(type='ApproxMaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.4, min_pos_iou=0.0,
                          ignore_iof_thr=-1),
            allowed_border=-1, pos_weight=-1, debug=False),
        test_cfg=dict(nms_pre=200, min_bbox_size=0, score_thr=0.02,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=50))


def tiny_ga_retina_cfg():
    return dict(
        type='RetinaNet',
        pretrained=None,
        backbone=tiny_swin_backbone_cfg(),
        neck=_neck(),
        bbox_head=dict(
            type='GARetinaHead', num_classes=NUM_CLASSES,
            in_channels=32, feat_channels=32, stacked_convs=1,
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
            loc_filter_thr=0.01,
            loss_loc=dict(type='FocalLoss', use_sigmoid=True,
                          gamma=2.0, alpha=0.25, loss_weight=1.0),
            loss_shape=dict(type='BoundedIoULoss', beta=0.2,
                            loss_weight=1.0),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                          gamma=2.0, alpha=0.25, loss_weight=1.0),
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
            pos_weight=-1, debug=False),
        test_cfg=dict(nms_pre=200, min_bbox_size=0, score_thr=0.02,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=50))


def _run_pair(cfg, seed_img=21, hw=HW):
    ref, module, variables = build_both(cfg, img_hw=hw, seed=3)
    img = make_image(*hw, seed=seed_img)
    ref_res = run_ref_simple_test(ref, img)
    out = run_jax_simple_test(module, variables, img)
    jax_res = jax_to_result(out, NUM_CLASSES, ori_shape=(*hw, 3))
    return ref_res, jax_res


@pytest.mark.parametrize('seed_img', [7, 21])
def test_sabl_retina_e2e(seed_img):
    ref_res, jax_res = _run_pair(tiny_sabl_retina_cfg(),
                                 seed_img=seed_img)
    match_dets(ref_res, jax_res, NUM_CLASSES)


def test_ga_retina_e2e():
    ref_res, jax_res = _run_pair(tiny_ga_retina_cfg())
    match_dets(ref_res, jax_res, NUM_CLASSES)
