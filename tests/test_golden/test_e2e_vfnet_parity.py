"""END-TO-END golden parity: VFNet — star-shaped deformable refinement
in the head forward plus varifocal scoring, full pipeline to final
keep-sets vs the reference torch model (mmdet/models/dense_heads/
vfnet_head.py forward :240, get_bboxes :370; DCN via the pure-torch
stub)."""
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


def tiny_vfnet_cfg(num_classes=NUM_CLASSES, use_atss=True):
    return dict(
        type='VFNet',
        pretrained=None,
        backbone=tiny_swin_backbone_cfg(),
        neck=dict(type='FPN', in_channels=[24, 48, 96, 192],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=dict(
            type='VFNetHead', num_classes=num_classes, in_channels=32,
            stacked_convs=1, feat_channels=32,
            strides=[8, 16, 32, 64, 128],
            center_sampling=False, dcn_on_last_conv=False,
            use_atss=use_atss, use_vfl=True,
            norm_cfg=dict(type='GN', num_groups=4, requires_grad=True),
            loss_cls=dict(type='VarifocalLoss', use_sigmoid=True,
                          alpha=0.75, gamma=2.0, iou_weighted=True,
                          loss_weight=1.0),
            loss_bbox=dict(type='GIoULoss', loss_weight=1.5),
            loss_bbox_refine=dict(type='GIoULoss', loss_weight=2.0)),
        train_cfg=dict(assigner=dict(type='ATSSAssigner', topk=9),
                       allowed_border=-1, pos_weight=-1, debug=False),
        test_cfg=dict(nms_pre=200, min_bbox_size=0, score_thr=0.02,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=50))


@pytest.mark.parametrize('use_atss', [True, False])
@pytest.mark.parametrize('seed_img', [7, 21])
def test_vfnet_e2e(seed_img, use_atss):
    cfg = tiny_vfnet_cfg(use_atss=use_atss)
    ref, module, variables = build_both(cfg, img_hw=HW, seed=3)
    img = make_image(*HW, seed=seed_img)
    ref_res = run_ref_simple_test(ref, img)
    out = run_jax_simple_test(module, variables, img)
    jax_res = jax_to_result(out, NUM_CLASSES, ori_shape=(*HW, 3))
    match_dets(ref_res, jax_res, NUM_CLASSES)
