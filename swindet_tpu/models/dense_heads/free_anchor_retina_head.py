"""FreeAnchor (reference: mmdet/models/dense_heads/
free_anchor_retina_head.py:11, arXiv:1909.02466): RetinaNet tower with
a bag-of-anchors maximum-likelihood loss instead of IoU assignment.

Static-shape port: per-gt top-k bags over padded gts with validity
masks; the reference's sparse max over same-class gts becomes a
column scatter-max.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..builder import HEADS
from ...core.bbox.iou import bbox_overlaps
from .retina_head import RetinaHead


@HEADS.register_module()
class FreeAnchorRetinaHead(RetinaHead):
    pre_anchor_topk: int = 50
    bbox_thr: float = 0.6
    gamma: float = 2.0
    alpha: float = 0.5

    def loss(self, rng, cls_scores, bbox_preds, gt_bboxes, gt_valid,
             gt_labels, img_shapes, pad_shapes) -> Dict[str, jnp.ndarray]:
        """(reference: free_anchor_retina_head.py:59 loss)."""
        featmap_sizes = tuple((s.shape[1], s.shape[2]) for s in cls_scores)
        anchors = jnp.concatenate(self.get_anchors(featmap_sizes), 0)
        b = gt_bboxes.shape[0]
        C = self.cls_out_channels
        cls_flat = jnp.concatenate([
            s.reshape(b, -1, C) for s in cls_scores], 1).astype(jnp.float32)
        box_flat = jnp.concatenate([
            p.reshape(b, -1, 4) for p in bbox_preds], 1).astype(jnp.float32)
        cls_prob = jax.nn.sigmoid(cls_flat)
        n = anchors.shape[0]

        def per_image(cls_prob_i, box_pred_i, gb, gv, gl):
            gl = jnp.clip(gl.astype(jnp.int32), 0, C - 1)
            # ---- image_box_prob (no-grad, reference :105-160)
            pred_boxes = jax.lax.stop_gradient(
                self._bbox_coder.decode(anchors, box_pred_i))
            obi = bbox_overlaps(gb, pred_boxes)            # (G, N)
            t1 = self.bbox_thr
            t2 = jnp.clip(jnp.max(obi, axis=1, keepdims=True),
                          t1 + 1e-12)
            obp = jnp.clip((obi - t1) / (t2 - t1), 0, 1)
            obp = jnp.where(gv[:, None], obp, 0.0)
            # per-class max over same-class gts: column scatter-max
            ibp = jnp.zeros((n, C)).at[:, gl].max(obp.T, mode='drop')

            # ---- bags: top-k anchors per gt by anchor IoU (:168)
            mqm = bbox_overlaps(gb, anchors)               # (G, N)
            _, matched = jax.lax.top_k(mqm, self.pre_anchor_topk)
            m_cls = jnp.take_along_axis(
                jnp.take(cls_prob_i, matched.reshape(-1), axis=0)
                .reshape(matched.shape + (C,)),
                gl[:, None, None], axis=-1)[..., 0]        # (G, K)
            m_anchors = jnp.take(anchors, matched.reshape(-1), axis=0) \
                .reshape(matched.shape + (4,))
            m_targets = self._bbox_coder.encode(
                m_anchors, jnp.broadcast_to(gb[:, None, :],
                                            m_anchors.shape))
            m_pred = jnp.take(box_pred_i, matched.reshape(-1), axis=0) \
                .reshape(matched.shape + (4,))
            lb = self._loss_bbox(m_pred, m_targets,
                                 reduction_override='none').sum(-1)
            m_box = jnp.exp(-lb)

            # positive bag loss (:219): -alpha*log(mean-max bag prob)
            m_prob = m_cls * m_box
            w = 1.0 / jnp.clip(1 - m_prob, 1e-12)
            w = w / jnp.sum(w, axis=1, keepdims=True)
            bag_prob = jnp.sum(w * m_prob, axis=1)
            pos_loss = -self.alpha * jnp.log(jnp.clip(bag_prob, 1e-12))
            pos_loss = jnp.where(gv, pos_loss, 0.0)

            # negative bag loss (:246): FL on cls_prob*(1-box_prob)
            prob = cls_prob_i * (1 - ibp)
            neg = (1 - self.alpha) * prob ** self.gamma * \
                (-jnp.log(jnp.clip(1 - prob, 1e-12)))
            return jnp.sum(pos_loss), jnp.sum(neg), jnp.sum(gv)

        pos_l, neg_l, n_pos = jax.vmap(per_image)(
            cls_prob, box_flat, gt_bboxes, gt_valid, gt_labels)
        num_pos = jnp.maximum(jnp.sum(n_pos).astype(jnp.float32), 1.0)
        return dict(
            positive_bag_loss=jnp.sum(pos_l) / num_pos,
            negative_bag_loss=jnp.sum(neg_l) /
            jnp.maximum(num_pos * self.pre_anchor_topk, 1.0))
