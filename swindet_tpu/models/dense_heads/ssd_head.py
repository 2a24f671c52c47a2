"""SSDHead (reference: mmdet/models/dense_heads/ssd_head.py:15).

TPU-native: the reference's per-image hard-negative mining
(`loss_cls_all[neg_inds].topk(3 * num_pos)`) is re-expressed as a
static-shape rank threshold — negatives are ranked by descending CE
loss and kept iff rank < min(neg_pos_ratio * num_pos, num_neg). Exact
same selected set, no dynamic shapes.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS
from .anchor_head import AnchorHead


@HEADS.register_module()
class SSDHead(AnchorHead):
    """Per-level 3x3 cls/reg convs over SSD anchors; softmax CE with
    hard-negative mining + SmoothL1 (reference ssd_head.py loss_single
    :149)."""

    def setup(self):
        # SSD uses softmax with background (num_classes + 1); no
        # loss_cls/loss_bbox configs in the reference — fixed losses
        from ..builder import (build_anchor_generator, build_assigner,
                               build_bbox_coder, build_sampler)
        ag = dict(self.anchor_generator)
        self.prior_generator = build_anchor_generator(ag)
        self.use_sigmoid_cls = False
        self.cls_out_channels = self.num_classes + 1
        self._bbox_coder = build_bbox_coder(dict(
            self.bbox_coder or dict(type='DeltaXYWHBBoxCoder')))
        if self.train_cfg:
            self._assigner = build_assigner(dict(self.train_cfg['assigner']))
            self._sampler = build_sampler(dict(
                self.train_cfg.get('sampler',
                                   dict(type='PseudoSampler'))))
        self._init_layers()

    def _init_layers(self):
        num_anchors = self.prior_generator.num_base_anchors
        in_chs = self.in_channels if isinstance(self.in_channels,
                                                (list, tuple)) \
            else [self.in_channels] * len(num_anchors)
        self.reg_convs = [
            nn.Conv(num_anchors[i] * 4, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name=f'reg_convs{i}')
            for i in range(len(in_chs))]
        self.cls_convs = [
            nn.Conv(num_anchors[i] * self.cls_out_channels, (3, 3),
                    padding=[(1, 1)] * 2, dtype=self.dtype,
                    name=f'cls_convs{i}')
            for i in range(len(in_chs))]

    def forward_single(self, x, lvl: int, train: bool = False):
        return self.cls_convs[lvl](x), self.reg_convs[lvl](x)

    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        outs = [self.forward_single(f, i, train)
                for i, f in enumerate(feats)]
        return tuple(zip(*outs))

    @property
    def sampling(self):
        return False

    # ---------------------------------------------------------------- loss
    def loss(self, rng, cls_scores, bbox_preds, gt_bboxes, gt_valid,
             gt_labels, img_shapes, pad_shapes) -> Dict[str, jnp.ndarray]:
        """(reference: ssd_head.py loss:181 + loss_single:149)."""
        featmap_sizes = tuple((s.shape[1], s.shape[2]) for s in cls_scores)
        anchor_list = self.get_anchors(featmap_sizes)
        (labels, label_weights, bbox_targets, bbox_weights, num_pos,
         num_neg) = self.get_targets(rng, featmap_sizes, anchor_list,
                                     gt_bboxes, gt_valid, gt_labels,
                                     img_shapes, pad_shapes)
        b = gt_bboxes.shape[0]
        cls_flat = jnp.concatenate([
            s.reshape(b, -1, self.cls_out_channels) for s in cls_scores],
            1).astype(jnp.float32)
        box_flat = jnp.concatenate([
            p.reshape(b, -1, 4) for p in bbox_preds], 1).astype(jnp.float32)

        num_total_pos = jnp.maximum(jnp.sum(num_pos).astype(jnp.float32),
                                    1.0)
        cfg = self.train_cfg
        neg_pos_ratio = float(cfg.get('neg_pos_ratio', 3))
        beta = float(cfg.get('smoothl1_beta', 1.0))

        def body(scores, box_flat_i, labels_i, lw_i, bt_i, bw_i, np_i):
            # hard-negative mining as a static rank threshold: keep
            # negatives in the top min(ratio*num_pos, num_neg) by CE
            # (reference :156-162) — exact same set, static shapes.
            logp = jax.nn.log_softmax(scores, axis=-1)
            ce = -jnp.take_along_axis(
                logp, jnp.clip(labels_i, 0)[:, None], axis=-1)[:, 0] * lw_i
            pos = (labels_i >= 0) & (labels_i < self.num_classes)
            neg = (labels_i == self.num_classes) & (lw_i > 0)
            neg_ce = jnp.where(neg, ce, -jnp.inf)
            order = jnp.argsort(-neg_ce)
            rank = jnp.zeros_like(order).at[order].set(
                jnp.arange(order.shape[0]))
            k = jnp.minimum(
                (neg_pos_ratio * np_i).astype(jnp.int32),
                jnp.sum(neg).astype(jnp.int32))
            keep_neg = neg & (rank < k)
            loss_cls = jnp.sum(jnp.where(pos | keep_neg, ce, 0.0))
            diff = jnp.abs(box_flat_i - bt_i)
            sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                            diff - 0.5 * beta)
            loss_bbox = jnp.sum(sl1 * bw_i)
            return loss_cls, loss_bbox

        loss_cls_i, loss_bbox_i = jax.vmap(body)(
            cls_flat, box_flat, labels, label_weights, bbox_targets,
            bbox_weights, num_pos)
        return dict(loss_cls=jnp.sum(loss_cls_i) / num_total_pos,
                    loss_bbox=jnp.sum(loss_bbox_i) / num_total_pos)
