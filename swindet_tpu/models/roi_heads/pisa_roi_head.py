"""PISA RoI head (reference: mmdet/models/roi_heads/pisa_roi_head.py:9)
— StandardRoIHead with ISR-P positive reweighting and the CARL loss.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
import jax.numpy as jnp

from ..builder import HEADS
from ..losses.pisa_loss import carl_loss, isr_p
from .standard_roi_head import StandardRoIHead


@HEADS.register_module()
class PISARoIHead(StandardRoIHead):

    def forward_train(self, rng, feats, proposals, proposal_valid,
                      gt_bboxes, gt_valid, gt_labels, gt_masks,
                      img_shapes) -> Dict[str, jnp.ndarray]:
        b, p = proposals.shape[:2]
        num = self._sampler.num
        isr_cfg = dict(dict(self.train_cfg).get('isr', {}) or {})
        carl_cfg = dict(dict(self.train_cfg).get('carl', {}) or {})

        def assign_sample(r, props, pvalid, gb, gv, gl):
            assign = self._assigner.assign(props, gb, gv, gl,
                                           bbox_valid=pvalid)
            return self._sampler.sample(r, assign, props, gb, gv, gl,
                                        bbox_valid=pvalid)

        rngs = jax.random.split(rng, b)
        samp = jax.vmap(assign_sample)(rngs, proposals, proposal_valid,
                                       gt_bboxes, gt_valid, gt_labels)
        batch_col = jnp.repeat(np.arange(b, dtype=np.float32), num)
        rois = jnp.concatenate(
            [batch_col[:, None], samp.bboxes.reshape(-1, 4)], axis=-1)
        cls_score, bbox_pred = self._bbox_forward(feats, rois,
                                                  train=True)
        tgt = jax.vmap(lambda s: self._bbox_head.get_targets(
            s, dict(self.train_cfg)))(samp)
        labels, label_weights, bbox_targets, bbox_weights = \
            jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), tgt)

        g = gt_bboxes.shape[1]
        gt_global = (jnp.repeat(jnp.arange(b), num) * g
                     + samp.pos_gt_inds.reshape(-1))

        losses = {}
        if isr_cfg:
            label_weights = isr_p(
                cls_score, bbox_pred, labels, label_weights,
                bbox_targets, rois, gt_global,
                self._bbox_head._bbox_coder,
                self._bbox_head.num_classes,
                loss_cls=self._bbox_head._loss_cls,
                k=float(isr_cfg.get('k', 2)),
                bias=float(isr_cfg.get('bias', 0)))
        losses.update(self._bbox_head.loss(
            cls_score, bbox_pred, rois, labels, label_weights,
            bbox_targets, bbox_weights))
        if carl_cfg:
            losses.update(carl_loss(
                cls_score, labels, bbox_pred, bbox_targets,
                self._bbox_head._loss_bbox,
                self._bbox_head.num_classes,
                k=float(carl_cfg.get('k', 1)),
                bias=float(carl_cfg.get('bias', 0.2)),
                # reference default avg = bbox_targets.size(0) = actual
                # roi count (pisa_loss.py:170) — valid slots here
                avg_factor=jnp.maximum(
                    jnp.sum((label_weights > 0).astype(jnp.float32)),
                    1.0)))

        if self.with_mask and gt_masks is not None:
            m = int(num * self._sampler.pos_fraction)
            pos_boxes = samp.bboxes[:, :m]
            pos_inds = samp.pos_gt_inds[:, :m]
            pos_mask = samp.is_pos[:, :m]
            pos_labels = jnp.clip(samp.pos_gt_labels[:, :m], 0)
            mask_rois = jnp.concatenate(
                [jnp.repeat(np.arange(b, dtype=np.float32), m)[:, None],
                 pos_boxes.reshape(-1, 4)], axis=-1)
            mask_feats = self._mask_extractor(feats, mask_rois)
            mask_pred = self._mask_head(mask_feats, train=True)
            mask_size = self.train_cfg.get('mask_size', 28)
            targets = jax.vmap(
                lambda gm, pb, pi: self._mask_head.get_targets(
                    gm, pb, pi, mask_size))(gt_masks, pos_boxes,
                                            pos_inds)
            losses.update(self._mask_head.loss(
                mask_pred, targets.reshape(-1, mask_size, mask_size),
                pos_labels.reshape(-1),
                pos_mask.reshape(-1).astype(jnp.float32)))
        return losses
