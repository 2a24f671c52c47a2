"""END-TO-END golden parity for SINGLE-STAGE detectors vs the reference
torch implementation: RetinaNet (anchor-based, per-level nms_pre top-k,
sigmoid scores, multiclass NMS) and FCOS (anchor-free, centerness-
weighted scores). Same per-class keep-set, boxes ≤1e-2, scores ≤1e-3.

Reference call path: mmdet/models/detectors/single_stage.py:91
simple_test → bbox_head.get_bboxes (retina_head / fcos_head).
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


def tiny_retinanet_cfg(num_classes=NUM_CLASSES):
    return dict(
        type='RetinaNet',
        pretrained=None,
        backbone=tiny_swin_backbone_cfg(),
        neck=dict(type='FPN', in_channels=[24, 48, 96, 192],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(
            type='RetinaHead', num_classes=num_classes,
            in_channels=32, stacked_convs=1, feat_channels=32,
            anchor_generator=dict(
                type='AnchorGenerator', octave_base_scale=4,
                scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[.0, .0, .0, .0],
                            target_stds=[1.0, 1.0, 1.0, 1.0]),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                          gamma=2.0, alpha=0.25, loss_weight=1.0),
            loss_bbox=dict(type='L1Loss', loss_weight=1.0)),
        train_cfg=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.4, min_pos_iou=0,
                          ignore_iof_thr=-1),
            allowed_border=-1, pos_weight=-1, debug=False),
        test_cfg=dict(nms_pre=200, min_bbox_size=0, score_thr=0.02,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=50))


def tiny_fcos_cfg(num_classes=NUM_CLASSES):
    return dict(
        type='FCOS',
        pretrained=None,
        backbone=tiny_swin_backbone_cfg(),
        neck=dict(type='FPN', in_channels=[24, 48, 96, 192],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=dict(
            type='FCOSHead', num_classes=num_classes, in_channels=32,
            stacked_convs=1, feat_channels=32,
            strides=[8, 16, 32, 64, 128],
            norm_cfg=None,
            loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                          gamma=2.0, alpha=0.25, loss_weight=1.0),
            loss_bbox=dict(type='IoULoss', loss_weight=1.0),
            loss_centerness=dict(type='CrossEntropyLoss',
                                 use_sigmoid=True, loss_weight=1.0)),
        train_cfg=dict(allowed_border=-1, pos_weight=-1, debug=False),
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
def test_retinanet_e2e(seed_img):
    ref_res, jax_res = _run_pair(tiny_retinanet_cfg(),
                                 seed_img=seed_img)
    match_dets(ref_res, jax_res, NUM_CLASSES)


@pytest.mark.parametrize('seed_img', [7, 21])
def test_fcos_e2e(seed_img):
    ref_res, jax_res = _run_pair(tiny_fcos_cfg(), seed_img=seed_img)
    match_dets(ref_res, jax_res, NUM_CLASSES)
