"""END-TO-END golden parity: DETR — set prediction, no NMS. Exercises
the production .pth converter's transformer key translation (packed
in_proj → split q/k/v, FFN/norm renames, query embedding) plus the full
inference chain: backbone → input_proj → sine positional encoding →
encoder/decoder → class softmax + sigmoid cxcywh decode → top-k
queries (reference: mmdet/models/dense_heads/transformer_head.py
forward :216, _get_bboxes_single :654)."""
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


def tiny_detr_cfg():
    backbone = tiny_swin_backbone_cfg()
    backbone['out_indices'] = (3,)
    return dict(
        type='DETR',
        pretrained=None,
        backbone=backbone,
        bbox_head=dict(
            type='TransformerHead',
            num_classes=NUM_CLASSES,
            in_channels=192,
            num_fcs=2,
            transformer=dict(
                type='Transformer',
                embed_dims=32,
                num_heads=2,
                num_encoder_layers=2,
                num_decoder_layers=2,
                feedforward_channels=64,
                dropout=0.0,
                return_intermediate_dec=True),
            positional_encoding=dict(
                type='SinePositionalEncoding', num_feats=16,
                normalize=True),
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                          loss_weight=1.0, class_weight=1.0,
                          bg_cls_weight=0.1),
            loss_bbox=dict(type='L1Loss', loss_weight=5.0),
            loss_iou=dict(type='GIoULoss', loss_weight=2.0)),
        train_cfg=dict(
            assigner=dict(
                type='HungarianAssigner',
                cls_cost=dict(type='ClassificationCost', weight=1.),
                reg_cost=dict(type='BBoxL1Cost', weight=5.0),
                iou_cost=dict(type='IoUCost', iou_mode='giou',
                              weight=2.0))),
        test_cfg=dict(max_per_img=20))


def test_detr_e2e():
    cfg = tiny_detr_cfg()
    ref, module, variables = build_both(cfg, img_hw=HW, seed=3)
    img = make_image(*HW, seed=21)
    ref_res = run_ref_simple_test(ref, img)
    out = run_jax_simple_test(module, variables, img)
    jax_res = jax_to_result(out, NUM_CLASSES, ori_shape=(*HW, 3))
    match_dets(ref_res, jax_res, NUM_CLASSES)
