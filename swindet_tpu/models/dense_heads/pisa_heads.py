"""PISA dense heads (reference: mmdet/models/dense_heads/
pisa_retinanet_head.py:10, pisa_ssd_head.py:10; arXiv:1904.04821) —
ISR-P positive reweighting + classification-aware regression (CARL)
on top of the Retina/SSD structures, reusing the shared pisa_loss
machinery (models/losses/pisa_loss.py)."""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..builder import HEADS
from ..losses.pisa_loss import carl_loss, isr_p
from ...core.anchors import anchor_inside_flags
from .retina_head import RetinaHead
from .ssd_head import SSDHead


def _flat_targets(head, featmap_sizes, gt_bboxes, gt_valid, gt_labels,
                  img_shapes, pad_shapes, is_rpn=False):
    """Full-anchor-set targets with per-anchor gt ids (B, N, ...)."""
    anchor_list = head.get_anchors(featmap_sizes)
    flat_anchors = jnp.concatenate(anchor_list, 0)
    g = gt_bboxes.shape[1]

    def single(bi, gb, gv, gl, ish, ps):
        valid_flags = jnp.concatenate(
            head.prior_generator.valid_flags(featmap_sizes, ps), 0)
        inside = anchor_inside_flags(
            flat_anchors, valid_flags, ish,
            head.train_cfg.get('allowed_border', -1))
        assign = head._assigner.assign(flat_anchors, gb, gv, gl,
                                       bbox_valid=inside)
        pos = assign.gt_inds > 0
        pos_gt = jnp.clip(assign.gt_inds - 1, 0)
        labels = jnp.where(pos, jnp.clip(assign.labels, 0),
                           head.num_classes)
        lw = (inside & (assign.gt_inds >= 0)).astype(jnp.float32)
        gt_box = jnp.take(gb, pos_gt, axis=0)
        bt = head._bbox_coder.encode(flat_anchors, gt_box)
        bt = jnp.where(pos[:, None], bt, 0.0)
        bw = jnp.tile(pos[:, None].astype(jnp.float32), (1, 4))
        return (labels, lw, bt, bw, pos, bi * g + pos_gt)

    b = gt_bboxes.shape[0]
    return flat_anchors, jax.vmap(single)(
        jnp.arange(b), gt_bboxes, gt_valid, gt_labels, img_shapes,
        pad_shapes)


@HEADS.register_module()
class PISARetinaHead(RetinaHead):

    def loss(self, rng, cls_scores, bbox_preds, gt_bboxes, gt_valid,
             gt_labels, img_shapes, pad_shapes) -> Dict[str, jnp.ndarray]:
        featmap_sizes = tuple((s.shape[1], s.shape[2])
                              for s in cls_scores)
        b = gt_bboxes.shape[0]
        anchors, (labels, lw, bt, bw, pos, gt_global) = _flat_targets(
            self, featmap_sizes, gt_bboxes, gt_valid, gt_labels,
            img_shapes, pad_shapes)
        num_pos = jnp.maximum(jnp.sum(pos).astype(jnp.float32), 1.0)

        cls_flat = jnp.concatenate([
            s.astype(jnp.float32).reshape(b, -1, self.cls_out_channels)
            for s in cls_scores], 1).reshape(-1, self.cls_out_channels)
        box_flat = jnp.concatenate([
            p.astype(jnp.float32).reshape(b, -1, 4)
            for p in bbox_preds], 1).reshape(-1, 4)
        labels = labels.reshape(-1)
        lw = lw.reshape(-1)
        bt = bt.reshape(-1, 4)
        bw = bw.reshape(-1, 4)
        anchors_flat = jnp.tile(anchors, (b, 1))

        if self.train_cfg.get('isr') is not None:
            lw = isr_p(cls_flat, box_flat, labels, lw, bt,
                       anchors_flat, gt_global.reshape(-1),
                       self._bbox_coder, self.num_classes,
                       loss_cls=self._loss_cls,
                       **{k: v for k, v in
                          dict(self.train_cfg['isr']).items()
                          if k in ('k', 'bias')})
        loss_cls = self._loss_cls(cls_flat, labels, weight=lw,
                                  avg_factor=num_pos)
        loss_bbox = self._loss_bbox(box_flat, bt, weight=bw,
                                    avg_factor=num_pos)
        out = dict(loss_cls=loss_cls, loss_bbox=loss_bbox)
        if self.train_cfg.get('carl') is not None:
            out.update(carl_loss(
                cls_flat, labels, box_flat, bt, self._loss_bbox,
                num_classes=self.num_classes, sigmoid=True,
                avg_factor=num_pos,
                **{k: v for k, v in
                   dict(self.train_cfg['carl']).items()
                   if k in ('k', 'bias')}))
        return out


@HEADS.register_module()
class PISASSDHead(SSDHead):

    def loss(self, rng, cls_scores, bbox_preds, gt_bboxes, gt_valid,
             gt_labels, img_shapes, pad_shapes) -> Dict[str, jnp.ndarray]:
        """SSD OHEM CE + SmoothL1 with ISR-P/CARL (reference:
        pisa_ssd_head.py)."""
        featmap_sizes = tuple((s.shape[1], s.shape[2])
                              for s in cls_scores)
        b = gt_bboxes.shape[0]
        anchors, (labels, lw, bt, bw, pos, gt_global) = _flat_targets(
            self, featmap_sizes, gt_bboxes, gt_valid, gt_labels,
            img_shapes, pad_shapes)
        num_pos_i = jnp.sum(pos, axis=1)
        num_total_pos = jnp.maximum(
            jnp.sum(num_pos_i).astype(jnp.float32), 1.0)

        cls_flat = jnp.concatenate([
            s.astype(jnp.float32).reshape(b, -1, self.cls_out_channels)
            for s in cls_scores], 1)
        box_flat = jnp.concatenate([
            p.astype(jnp.float32).reshape(b, -1, 4)
            for p in bbox_preds], 1)

        lwf = lw.reshape(-1)
        if self.train_cfg.get('isr') is not None:
            lwf = isr_p(
                cls_flat.reshape(-1, self.cls_out_channels),
                box_flat.reshape(-1, 4), labels.reshape(-1), lwf,
                bt.reshape(-1, 4), jnp.tile(anchors, (b, 1)),
                gt_global.reshape(-1), self._bbox_coder,
                self.num_classes,
                loss_cls=self._loss_cls_for_isr(),
                **{k: v for k, v in
                   dict(self.train_cfg['isr']).items()
                   if k in ('k', 'bias')})
        lw = lwf.reshape(b, -1)

        ratio = float(self.train_cfg.get('neg_pos_ratio', 3))
        beta = float(self.train_cfg.get('smoothl1_beta', 1.0))

        def per_image(scores, bflat, labels_i, lw_i, bt_i, bw_i, np_i):
            logp = jax.nn.log_softmax(scores, axis=-1)
            ce = -jnp.take_along_axis(
                logp, jnp.clip(labels_i, 0)[:, None], -1)[:, 0] * lw_i
            posm = labels_i < self.num_classes
            neg = (labels_i == self.num_classes) & (lw_i > 0)
            neg_ce = jnp.where(neg, ce, -jnp.inf)
            order = jnp.argsort(-neg_ce)
            rank = jnp.zeros_like(order).at[order].set(
                jnp.arange(order.shape[0]))
            kk = jnp.minimum((ratio * np_i).astype(jnp.int32),
                             jnp.sum(neg).astype(jnp.int32))
            keep_neg = neg & (rank < kk)
            loss_cls = jnp.sum(jnp.where(posm | keep_neg, ce, 0.0))
            diff = jnp.abs(bflat - bt_i)
            sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                            diff - 0.5 * beta)
            loss_bbox = jnp.sum(sl1 * bw_i)
            return loss_cls, loss_bbox

        lc, lb = jax.vmap(per_image)(cls_flat, box_flat, labels, lw, bt,
                                     bw, num_pos_i)
        out = dict(loss_cls=jnp.sum(lc) / num_total_pos,
                   loss_bbox=jnp.sum(lb) / num_total_pos)
        if self.train_cfg.get('carl') is not None:
            out.update(carl_loss(
                cls_flat.reshape(-1, self.cls_out_channels),
                labels.reshape(-1), box_flat.reshape(-1, 4),
                bt.reshape(-1, 4), self._smooth_l1_for_carl(beta),
                num_classes=self.num_classes, sigmoid=False,
                avg_factor=num_total_pos,
                **{k: v for k, v in
                   dict(self.train_cfg['carl']).items()
                   if k in ('k', 'bias')}))
        return out

    def _loss_cls_for_isr(self):
        from ..builder import build_loss
        return build_loss(dict(type='CrossEntropyLoss',
                               use_sigmoid=False, loss_weight=1.0))

    @staticmethod
    def _smooth_l1_for_carl(beta):
        from ..builder import build_loss
        return build_loss(dict(type='SmoothL1Loss', beta=beta,
                               loss_weight=1.0))
