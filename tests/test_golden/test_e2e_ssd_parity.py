"""END-TO-END golden parity: SSD300 — VGG16+extras backbone (through
the converter's SSDVGG key translation), SSD anchor schedule, softmax
class scores, per-class NMS (reference: mmdet/models/backbones/
ssd_vgg.py, dense_heads/ssd_head.py, anchor_head.py get_bboxes)."""
import numpy as np
import pytest

from . import refbridge
from .common import (build_both, jax_to_result, make_image, match_dets,
                     run_jax_simple_test, run_ref_simple_test)

pytestmark = pytest.mark.skipif(not refbridge.reference_available(),
                                reason='reference checkout not mounted')

NUM_CLASSES = 4
HW = (300, 300)


def tiny_ssd_cfg():
    input_size = 300
    return dict(
        type='SingleStageDetector',
        pretrained=None,
        backbone=dict(type='SSDVGG', input_size=input_size, depth=16,
                      with_last_pool=False, ceil_mode=True,
                      out_indices=(3, 4), out_feature_indices=(22, 34),
                      l2_norm_scale=20),
        neck=None,
        bbox_head=dict(
            type='SSDHead',
            in_channels=(512, 1024, 512, 256, 256, 256),
            num_classes=NUM_CLASSES,
            anchor_generator=dict(
                type='SSDAnchorGenerator',
                scale_major=False,
                input_size=input_size,
                basesize_ratio_range=(0.15, 0.9),
                strides=[8, 16, 32, 64, 100, 300],
                ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]]),
            bbox_coder=dict(
                type='DeltaXYWHBBoxCoder',
                target_means=[.0, .0, .0, .0],
                target_stds=[0.1, 0.1, 0.2, 0.2])),
        train_cfg=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.5, min_pos_iou=0.,
                          ignore_iof_thr=-1,
                          gt_max_assign_all=False),
            smoothl1_beta=1.,
            allowed_border=-1, pos_weight=-1,
            neg_pos_ratio=3, debug=False),
        test_cfg=dict(nms_pre=200, min_bbox_size=0, score_thr=0.02,
                      nms=dict(type='nms', iou_threshold=0.45),
                      max_per_img=50))


def test_ssd_e2e():
    cfg = tiny_ssd_cfg()
    ref, module, variables = build_both(cfg, img_hw=HW, seed=3)
    img = make_image(*HW, seed=21)
    ref_res = run_ref_simple_test(ref, img)
    out = run_jax_simple_test(module, variables, img)
    jax_res = jax_to_result(out, NUM_CLASSES, ori_shape=(*HW, 3))
    match_dets(ref_res, jax_res, NUM_CLASSES)
