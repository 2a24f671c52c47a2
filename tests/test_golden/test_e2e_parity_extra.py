"""END-TO-END golden parity: YOLACT (protonet masks + Fast NMS) and
CornerNet (hourglass + corner-heatmap decode + soft-NMS) vs the
reference torch models.

Reference call paths: mmdet/models/dense_heads/yolact_head.py
get_bboxes (fast_nms) + YOLACTProtonet.get_seg_masks (proto crop +
full-image interpolate), corner_head.py get_bboxes (corner matching,
distance_threshold, soft-NMS rescoring).

Box/score/keep-set equality is exact; YOLACT masks are compared by
IoU ≥ 0.95 — the reference interpolates cropped proto masks straight
to image size while we resample through a fixed 28×28 prob patch
(static shapes), which only differs on anti-aliased borders.
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


def _mask_iou(a, b):
    a = a.astype(bool)
    b = b.astype(bool)
    u = np.logical_or(a, b).sum()
    return 1.0 if u == 0 else np.logical_and(a, b).sum() / u


def tiny_yolact_cfg():
    return dict(
        type='YOLACT',
        pretrained=None,
        backbone=tiny_swin_backbone_cfg(),
        neck=dict(type='FPN', in_channels=[24, 48, 96, 192],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_input', num_outs=5,
                  upsample_cfg=dict(mode='bilinear')),
        bbox_head=dict(
            type='YOLACTHead', num_classes=NUM_CLASSES, in_channels=32,
            feat_channels=32, num_head_convs=1, num_protos=8,
            use_ohem=True,
            anchor_generator=dict(type='AnchorGenerator',
                                  octave_base_scale=3,
                                  scales_per_octave=1,
                                  ratios=[0.5, 1.0, 2.0],
                                  strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0., 0., 0., 0.],
                            target_stds=[0.1, 0.1, 0.2, 0.2]),
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                          reduction='none', loss_weight=1.0),
            loss_bbox=dict(type='SmoothL1Loss', beta=1.0,
                           loss_weight=1.5)),
        segm_head=dict(type='YOLACTSegmHead', num_classes=NUM_CLASSES,
                       in_channels=32),
        mask_head=dict(type='YOLACTProtonet', num_classes=NUM_CLASSES,
                       in_channels=32, num_protos=8,
                       proto_channels=(16, 16, 8),
                       proto_kernel_sizes=(3, 3, 1),
                       max_masks_to_train=16),
        train_cfg=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.4, min_pos_iou=0.,
                          ignore_iof_thr=-1, gt_max_assign_all=False),
            smoothl1_beta=1.0, allowed_border=-1, pos_weight=-1,
            neg_pos_ratio=3),
        test_cfg=dict(nms_pre=100, min_bbox_size=0, score_thr=0.05,
                      iou_thr=0.5,
                      nms=dict(type='fast_nms', iou_threshold=0.5,
                               top_k=32),
                      top_k=32, max_per_img=20, mask_thr_binary=0.5))


def tiny_cornernet_cfg():
    return dict(
        type='CornerNet',
        pretrained=None,
        # stage_channels[0] must be 256: the reference stem hard-codes
        # Conv(3,128,s2) + ResLayer(128,256,s2) regardless of
        # stage_channels (hourglass.py:127-129), so any other leading
        # channel cannot even forward in torch.
        backbone=dict(type='HourglassNet', downsample_times=3,
                      num_stacks=2, stage_channels=[256, 16, 24, 24],
                      stage_blocks=[1, 1, 1, 1], feat_channel=16),
        neck=None,
        bbox_head=dict(
            type='CornerHead', num_classes=NUM_CLASSES, in_channels=16,
            num_feat_levels=2, corner_emb_channels=1,
            loss_heatmap=dict(type='GaussianFocalLoss', alpha=2.0,
                              gamma=4.0, loss_weight=1),
            loss_embedding=dict(type='AssociativeEmbeddingLoss',
                                pull_weight=0.10, push_weight=0.10),
            loss_offset=dict(type='SmoothL1Loss', beta=1.0,
                             loss_weight=1)),
        train_cfg=None,
        # corner_topk**2 must cover the reference's hard-coded
        # num_dets=1000 (decode_heatmap default; get_bboxes never
        # forwards test_cfg.num_dets — corner_head.py:728-740,877).
        # Hard NMS here, not CornerNet's production soft-NMS: random-init
        # corner scores are near-tied (~1e-5 apart) and the gaussian
        # decay cascade amplifies sub-ulp cross-impl differences into
        # keep-set swaps, so exact equality is only well-posed for hard
        # NMS. Soft-NMS parity vs mmcv semantics is pinned on separated
        # scores in test_soft_nms_parity.py.
        test_cfg=dict(corner_topk=32, local_maximum_kernel=3,
                      distance_threshold=0.5, num_dets=1000,
                      max_per_img=20,
                      nms=dict(type='nms', iou_threshold=0.5)))


def test_yolact_e2e():
    cfg = tiny_yolact_cfg()
    ref, module, variables = build_both(cfg, img_hw=HW, seed=3)
    img = make_image(*HW, seed=21)
    ref_res = run_ref_simple_test(ref, img)
    out = run_jax_simple_test(module, variables, img)
    jax_res = jax_to_result(out, NUM_CLASSES, ori_shape=(*HW, 3))
    ref_boxes, ref_masks = ref_res
    jax_boxes, jax_masks = jax_res
    match_dets(ref_boxes, jax_boxes, NUM_CLASSES)
    for c in range(NUM_CLASSES):
        assert len(ref_masks[c]) == len(jax_masks[c]), f'class {c}'
        for k, (rm, jm) in enumerate(zip(ref_masks[c], jax_masks[c])):
            iou = _mask_iou(np.asarray(rm), np.asarray(jm))
            assert iou >= 0.95, f'class {c} det {k}: mask IoU {iou:.3f}'


@pytest.mark.parametrize('seed_img', [7, 21])
def test_cornernet_e2e(seed_img):
    cfg = tiny_cornernet_cfg()
    ref, module, variables = build_both(cfg, img_hw=HW, seed=3)
    img = make_image(*HW, seed=seed_img)
    # no RandomCenterCropPad in this pipeline → zero crop border
    ref_res = run_ref_simple_test(ref, img,
                                  extra_meta=dict(border=(0, 0, 0, 0)))
    out = run_jax_simple_test(module, variables, img)
    jax_res = jax_to_result(out, NUM_CLASSES, ori_shape=(*HW, 3))
    match_dets(ref_res, jax_res, NUM_CLASSES)
