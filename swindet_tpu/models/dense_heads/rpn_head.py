"""RPN head (reference: mmdet/models/dense_heads/rpn_head.py:17).

Proposal generation (reference :82-233) becomes a fully padded pipeline:
per-level top-``nms_pre`` score selection → delta decode clipped to the
image → min-size masking → level-offset batched NMS → fixed
``max_per_img`` proposal slots + validity mask, all vmapped over batch.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS
from ...core.nms import batched_nms
from .anchor_head import AnchorHead


@HEADS.register_module()
class RPNHead(AnchorHead):
    """3×3 conv + ReLU + 1×1 cls/reg; class-agnostic sigmoid."""
    num_classes: int = 1
    IS_RPN = True

    def _init_layers(self):
        # reference rpn_head.py init_weights: normal_init(std=0.01) on all
        # three convs — proposals from a random-init head stay anchor-sized
        from ..layers import _Conv3x3Pallas, normal_init
        import jax as _jax
        if (_jax.default_backend() == 'tpu'
                and self.in_channels % 128 == 0
                and self.feat_channels % 128 == 0):
            self.rpn_conv = _Conv3x3Pallas(
                out_channels=self.feat_channels, relu=True,
                dtype=self.dtype, kernel_init=normal_init(0.01),
                name='rpn_conv')
            self._rpn_conv_fused_relu = True
        else:
            self.rpn_conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                                    dtype=self.dtype,
                                    kernel_init=normal_init(0.01),
                                    name='rpn_conv')
            self._rpn_conv_fused_relu = False
        self.rpn_cls = nn.Conv(self.num_base_priors * self.cls_out_channels,
                               (1, 1), dtype=self.dtype,
                               kernel_init=normal_init(0.01), name='rpn_cls')
        self.rpn_reg = nn.Conv(self.num_base_priors * 4, (1, 1),
                               dtype=self.dtype,
                               kernel_init=normal_init(0.01), name='rpn_reg')

    def forward_single(self, x, train: bool = False):
        x = self.rpn_conv(x)
        if not self._rpn_conv_fused_relu:
            x = nn.relu(x)
        return self.rpn_cls(x), self.rpn_reg(x)

    def loss(self, rng, cls_scores, bbox_preds, gt_bboxes, gt_valid,
             gt_labels, img_shapes, pad_shapes):
        losses = super().loss(rng, cls_scores, bbox_preds, gt_bboxes,
                              gt_valid, None, img_shapes, pad_shapes)
        return dict(loss_rpn_cls=losses['loss_cls'],
                    loss_rpn_bbox=losses['loss_bbox'])

    def get_proposals(self, cls_scores, bbox_preds, img_shapes, cfg):
        """Batched proposal generation (reference: rpn_head.py:82).

        Returns (proposals (B, max_per_img, 4), scores (B, max_per_img),
        valid (B, max_per_img)).
        """
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        anchors = self.get_anchors(featmap_sizes)
        nms_pre = cfg.get('nms_pre', 1000)
        max_per_img = cfg.get('max_per_img', 1000)
        min_bbox_size = cfg.get('min_bbox_size', 0)
        iou_thr = cfg['nms']['iou_threshold']
        b = cls_scores[0].shape[0]

        flat_scores = [s.reshape(b, -1) for s in cls_scores]
        flat_preds = [p.reshape(b, -1, 4) for p in bbox_preds]

        def per_image(scores_lvls, preds_lvls, img_shape):
            all_boxes, all_scores, all_ids, all_valid = [], [], [], []
            for lvl, (score, pred) in enumerate(zip(scores_lvls,
                                                    preds_lvls)):
                score = jax.nn.sigmoid(score.astype(jnp.float32))
                k = min(nms_pre, score.shape[0])
                from ...core.nms import fast_topk
                top_s, top_i = fast_topk(score, k)
                top_p = pred[top_i]
                top_a = anchors[lvl][top_i]
                boxes = self._bbox_coder.decode(top_a, top_p,
                                                max_shape=img_shape)
                valid = jnp.ones((k,), bool)
                if min_bbox_size >= 0:
                    w = boxes[:, 2] - boxes[:, 0]
                    h = boxes[:, 3] - boxes[:, 1]
                    valid &= (w > min_bbox_size) & (h > min_bbox_size)
                all_boxes.append(boxes)
                all_scores.append(top_s)
                all_ids.append(jnp.full((k,), lvl, jnp.int32))
                all_valid.append(valid)
            boxes = jnp.concatenate(all_boxes, 0)
            scores = jnp.concatenate(all_scores, 0)
            ids = jnp.concatenate(all_ids, 0)
            valid = jnp.concatenate(all_valid, 0)
            res = batched_nms(boxes, scores, ids, iou_thr, max_per_img,
                              valid=valid)
            return res.dets[:, :4], res.dets[:, 4], res.valid

        return jax.vmap(per_image)(flat_scores, flat_preds, img_shapes)
