"""END-TO-END golden parity, single-stage round 4: PAA (ATSS-style
boxes + score voting at test time) and FSAF (anchor-free TBLR branch)
vs the reference torch models.

Reference call paths: mmdet/models/dense_heads/paa_head.py
_get_bboxes incl. score_voting :667, fsaf_head.py (RetinaHead
get_bboxes over the TBLR coder).
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
                add_extra_convs='on_output', num_outs=5,
                relu_before_extra_convs=True)


def tiny_paa_cfg(score_voting=True):
    return dict(
        type='PAA',
        pretrained=None,
        backbone=tiny_swin_backbone_cfg(),
        neck=_neck(),
        bbox_head=dict(
            type='PAAHead', num_classes=NUM_CLASSES, in_channels=32,
            stacked_convs=1, feat_channels=32,
            score_voting=score_voting,
            # the shipped PAA recipe trains on decoded boxes
            # (reference configs/paa/paa_r50_fpn_1x_coco.py:26); without
            # it the reference's iou_target compares decoded preds
            # against ENCODED targets -> iou 0 -> avg_factor 0 -> inf
            reg_decoded_bbox=True,
            norm_cfg=dict(type='GN', num_groups=4, requires_grad=True),
            anchor_generator=dict(
                type='AnchorGenerator', ratios=[1.0],
                octave_base_scale=8, scales_per_octave=1,
                strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[.0, .0, .0, .0],
                            target_stds=[0.1, 0.1, 0.2, 0.2]),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                          gamma=2.0, alpha=0.25, loss_weight=1.0),
            loss_centerness=dict(type='CrossEntropyLoss',
                                 use_sigmoid=True, loss_weight=0.5),
            loss_bbox=dict(type='GIoULoss', loss_weight=1.3)),
        train_cfg=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.1,
                          neg_iou_thr=0.1, min_pos_iou=0,
                          ignore_iof_thr=-1),
            allowed_border=-1, pos_weight=-1, debug=False),
        test_cfg=dict(nms_pre=200, min_bbox_size=0, score_thr=0.02,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=50))


def tiny_fsaf_cfg():
    return dict(
        type='FSAF',
        pretrained=None,
        backbone=tiny_swin_backbone_cfg(),
        neck=dict(type='FPN', in_channels=[24, 48, 96, 192],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(
            type='FSAFHead', num_classes=NUM_CLASSES, in_channels=32,
            stacked_convs=1, feat_channels=32,
            reg_decoded_bbox=True,
            anchor_generator=dict(
                type='AnchorGenerator', octave_base_scale=1,
                scales_per_octave=1, ratios=[1.0],
                strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='TBLRBBoxCoder',
                            normalizer=4.0),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                          gamma=2.0, alpha=0.25, loss_weight=1.0,
                          reduction='none'),
            loss_bbox=dict(type='IoULoss', eps=1e-6, loss_weight=1.0,
                           reduction='none')),
        train_cfg=dict(
            assigner=dict(type='CenterRegionAssigner',
                          pos_scale=0.2, neg_scale=0.2,
                          min_pos_iof=0.01),
            allowed_border=-1, pos_weight=-1, debug=False),
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


@pytest.mark.parametrize('score_voting', [True, False])
def test_paa_e2e(score_voting):
    ref_res, jax_res = _run_pair(tiny_paa_cfg(score_voting))
    match_dets(ref_res, jax_res, NUM_CLASSES)


@pytest.mark.parametrize('seed_img', [7, 21])
def test_fsaf_e2e(seed_img):
    ref_res, jax_res = _run_pair(tiny_fsaf_cfg(), seed_img=seed_img)
    match_dets(ref_res, jax_res, NUM_CLASSES)
