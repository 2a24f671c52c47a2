"""END-TO-END golden parity, single-stage round 3: RepPoints (point-set
→ minmax/moment box decode through deformable convs) and FoveaBox
(log-scale base-edge decode) vs the reference torch models.

Reference call paths: mmdet/models/dense_heads/reppoints_head.py
get_bboxes (points2bbox :165), fovea_head.py get_bboxes (:264).
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


def tiny_reppoints_cfg(transform='moment'):
    return dict(
        type='RepPointsDetector',
        pretrained=None,
        backbone=tiny_swin_backbone_cfg(),
        neck=_neck(),
        bbox_head=dict(
            type='RepPointsHead', num_classes=NUM_CLASSES,
            in_channels=32, feat_channels=32, point_feat_channels=32,
            stacked_convs=1, num_points=9, gradient_mul=0.1,
            point_strides=[8, 16, 32, 64, 128], point_base_scale=4,
            transform_method=transform,
            loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                          gamma=2.0, alpha=0.25, loss_weight=1.0),
            loss_bbox_init=dict(type='SmoothL1Loss', beta=1.0 / 9.0,
                                loss_weight=0.5),
            loss_bbox_refine=dict(type='SmoothL1Loss', beta=1.0 / 9.0,
                                  loss_weight=1.0)),
        train_cfg=dict(
            init=dict(
                assigner=dict(type='PointAssigner', scale=4,
                              pos_num=1),
                allowed_border=-1, pos_weight=-1, debug=False),
            refine=dict(
                assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                              neg_iou_thr=0.4, min_pos_iou=0,
                              ignore_iof_thr=-1),
                allowed_border=-1, pos_weight=-1, debug=False)),
        test_cfg=dict(nms_pre=200, min_bbox_size=0, score_thr=0.02,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=50))


def tiny_fovea_cfg():
    return dict(
        type='FOVEA',
        pretrained=None,
        backbone=tiny_swin_backbone_cfg(),
        neck=_neck(),
        bbox_head=dict(
            type='FoveaHead', num_classes=NUM_CLASSES, in_channels=32,
            feat_channels=32, stacked_convs=1,
            strides=[8, 16, 32, 64, 128],
            base_edge_list=[16, 32, 64, 128, 256],
            scale_ranges=((1, 32), (16, 64), (32, 128), (64, 256),
                          (128, 512)),
            sigma=0.4, with_deform=False,
            loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                          gamma=1.50, alpha=0.4, loss_weight=1.0),
            loss_bbox=dict(type='SmoothL1Loss', beta=0.11,
                           loss_weight=0.75)),
        train_cfg=dict(),
        test_cfg=dict(nms_pre=200, score_thr=0.02,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=50))


def _run_pair(cfg, seed_img=21, hw=HW):
    ref, module, variables = build_both(cfg, img_hw=hw, seed=3)
    img = make_image(*hw, seed=seed_img)
    ref_res = run_ref_simple_test(ref, img)
    out = run_jax_simple_test(module, variables, img)
    jax_res = jax_to_result(out, NUM_CLASSES, ori_shape=(*hw, 3))
    return ref_res, jax_res


@pytest.mark.parametrize('transform', ['moment', 'minmax'])
def test_reppoints_e2e(transform):
    ref_res, jax_res = _run_pair(tiny_reppoints_cfg(transform))
    match_dets(ref_res, jax_res, NUM_CLASSES)


@pytest.mark.parametrize('seed_img', [7, 21])
def test_fovea_e2e(seed_img):
    ref_res, jax_res = _run_pair(tiny_fovea_cfg(), seed_img=seed_img)
    match_dets(ref_res, jax_res, NUM_CLASSES)
