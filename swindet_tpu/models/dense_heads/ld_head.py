"""LDHead — Localization Distillation on GFL (reference:
mmdet/models/dense_heads/ld_head.py:11; arXiv:2102.12252). The
teacher's box-distribution logits become soft targets for a
temperature-KL term on the student's positive-anchor corners."""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..builder import HEADS, build_loss
from ...core.bbox.iou import bbox_overlaps
from .gfl_head import GFLHead


@HEADS.register_module()
class LDHead(GFLHead):
    loss_ld: Optional[dict] = None

    def setup(self):
        super().setup()
        self._loss_ld = build_loss(dict(
            self.loss_ld or dict(type='KnowledgeDistillationKLDivLoss',
                                 loss_weight=0.25, T=10)))

    def loss(self, rng, cls_scores, bbox_preds, gt_bboxes, gt_valid,
             gt_labels, img_shapes, pad_shapes,
             soft_targets=None) -> Dict[str, jnp.ndarray]:
        losses = super().loss(rng, cls_scores, bbox_preds, gt_bboxes,
                              gt_valid, gt_labels, img_shapes,
                              pad_shapes)
        if soft_targets is None:
            return losses
        # recompute pos/weights (XLA CSE folds the duplicate targets)
        featmap_sizes = tuple((s.shape[1], s.shape[2])
                              for s in cls_scores)
        anchor_list = self.get_anchors(featmap_sizes)
        num_level_anchors = [int(a.shape[0]) for a in anchor_list]
        flat_anchors = jnp.concatenate(anchor_list, 0)
        b = gt_bboxes.shape[0]
        labels, label_weights, bbox_targets, pos = jax.vmap(
            lambda gb, gv, gl, sh, ps: self._gfl_target_single(
                featmap_sizes, flat_anchors, num_level_anchors, gb, gv,
                gl, sh, ps))(gt_bboxes, gt_valid, gt_labels, img_shapes,
                             pad_shapes)
        cls_flat = jnp.concatenate([
            s.reshape(b, -1, self.cls_out_channels) for s in cls_scores],
            1)
        box_flat = jnp.concatenate([
            p.reshape(b, -1, 4 * (self.reg_max + 1))
            for p in bbox_preds], 1)
        soft_flat = jnp.concatenate([
            p.reshape(b, -1, 4 * (self.reg_max + 1))
            for p in soft_targets], 1)
        weight_t = jnp.max(jax.nn.sigmoid(
            jax.lax.stop_gradient(cls_flat.astype(jnp.float32))), -1)
        weight_t = jnp.where(pos, weight_t, 0.0)
        avg = jnp.maximum(jnp.sum(weight_t), 1e-6)
        losses['loss_ld'] = self._loss_ld(
            box_flat.reshape(-1, self.reg_max + 1),
            soft_flat.reshape(-1, self.reg_max + 1),
            weight=jnp.broadcast_to(weight_t[..., None],
                                    weight_t.shape + (4,)).reshape(-1),
            avg_factor=4.0 * avg)
        return losses
