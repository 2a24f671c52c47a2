"""END-TO-END golden parity: Sparse R-CNN — learned proposals
(EmbeddingRPN) + iterative DIIHead refinement, no NMS. Exercises the
converter's Sparse R-CNN key translation (packed attention in_proj,
DynamicConv, cls/reg tower flattening, proposal embeddings) and the
full inference chain incl. per-stage RoIAlign on refreshed boxes
(reference: mmdet/models/roi_heads/sparse_roi_head.py simple_test
:249, detectors/sparse_rcnn.py)."""
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
NUM_PROPOSALS = 10
NUM_STAGES = 2


def tiny_sparse_rcnn_cfg():
    stage = dict(
        type='DIIHead',
        num_classes=NUM_CLASSES,
        num_ffn_fcs=2,
        num_heads=2,
        num_cls_fcs=1,
        num_reg_fcs=3,
        feedforward_channels=64,
        in_channels=32,
        dropout=0.0,
        ffn_act_cfg=dict(type='ReLU', inplace=True),
        dynamic_conv_cfg=dict(
            type='DynamicConv',
            in_channels=32,
            feat_channels=16,
            out_channels=32,
            input_feat_shape=7,
            act_cfg=dict(type='ReLU', inplace=True),
            norm_cfg=dict(type='LN')),
        loss_bbox=dict(type='L1Loss', loss_weight=5.0),
        loss_iou=dict(type='GIoULoss', loss_weight=2.0),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=2.0),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder', clip_border=False,
                        target_means=[0., 0., 0., 0.],
                        target_stds=[0.5, 0.5, 1., 1.]))
    rcnn_stage = dict(
        assigner=dict(
            type='HungarianAssigner',
            cls_cost=dict(type='FocalLossCost', weight=2.0),
            reg_cost=dict(type='BBoxL1Cost', weight=5.0),
            iou_cost=dict(type='IoUCost', iou_mode='giou', weight=2.0)),
        sampler=dict(type='PseudoSampler'),
        pos_weight=1)
    return dict(
        type='SparseRCNN',
        pretrained=None,
        backbone=tiny_swin_backbone_cfg(),
        neck=dict(type='FPN', in_channels=[24, 48, 96, 192],
                  out_channels=32, start_level=0,
                  add_extra_convs='on_input', num_outs=4),
        rpn_head=dict(type='EmbeddingRPNHead',
                      num_proposals=NUM_PROPOSALS,
                      proposal_feature_channel=32),
        roi_head=dict(
            type='SparseRoIHead',
            num_stages=NUM_STAGES,
            stage_loss_weights=[1] * NUM_STAGES,
            proposal_feature_channel=32,
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=7,
                               sampling_ratio=2),
                out_channels=32,
                featmap_strides=[4, 8, 16, 32]),
            bbox_head=[dict(stage) for _ in range(NUM_STAGES)]),
        train_cfg=dict(
            rpn=None,
            rcnn=[dict(rcnn_stage) for _ in range(NUM_STAGES)]),
        test_cfg=dict(rpn=None,
                      rcnn=dict(max_per_img=NUM_PROPOSALS)))


def _sort_by_score(res):
    # Sparse R-CNN has no NMS and the reference's top-k is unsorted —
    # per-class row ORDER is unspecified; compare as score-sorted sets.
    return [r[np.argsort(-r[:, 4])] for r in res]


def test_sparse_rcnn_e2e():
    cfg = tiny_sparse_rcnn_cfg()
    ref, module, variables = build_both(cfg, img_hw=HW, seed=3)
    img = make_image(*HW, seed=21)
    ref_res = run_ref_simple_test(ref, img)
    out = run_jax_simple_test(module, variables, img)
    jax_res = jax_to_result(out, NUM_CLASSES, ori_shape=(*HW, 3))
    match_dets(_sort_by_score(ref_res), _sort_by_score(jax_res),
               NUM_CLASSES)
