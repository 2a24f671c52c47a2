"""GFLHead — Generalized Focal Loss (reference: mmdet/models/
dense_heads/gfl_head.py:53, arXiv:2006.04388).

Joint cls-quality scores (QFL), discretized box-distance distributions
decoded by a softmax integral (DFL), ATSS assignment. TPU-native:
full-set masked targets; per-anchor stride vector replaces the
reference's per-level loss loop, so the whole loss is one fused
reduction over the level-concatenated anchor set.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS, build_loss
from ..layers import ConvModule, bias_prob_init, normal_init
from ...core.anchors import anchor_inside_flags
from ...core.bbox.coders import bbox2distance, distance2bbox
from ...core.bbox.iou import bbox_overlaps
from ...core.nms import multiclass_nms
from .anchor_head import AnchorHead


def integral(x: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """softmax-expected distance over {0..reg_max} bins (reference:
    gfl_head.py:15 Integral). x: (..., 4*(reg_max+1)) → (..., 4)."""
    shape = x.shape[:-1]
    p = jax.nn.softmax(
        x.reshape(shape + (4, reg_max + 1)).astype(jnp.float32), axis=-1)
    proj = jnp.arange(reg_max + 1, dtype=jnp.float32)
    return jnp.sum(p * proj, axis=-1)


@HEADS.register_module()
class GFLHead(AnchorHead):
    stacked_convs: int = 4
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    reg_max: int = 16
    loss_dfl: Optional[dict] = None

    def _init_layers(self):
        norm_cfg = self.norm_cfg or dict(type='GN', num_groups=32)
        self.cls_convs = [
            ConvModule(self.feat_channels, 3, padding=1,
                       norm_cfg=norm_cfg, act_cfg=dict(type='ReLU'),
                       dtype=self.dtype, name=f'cls_convs{i}')
            for i in range(self.stacked_convs)]
        self.reg_convs = [
            ConvModule(self.feat_channels, 3, padding=1,
                       norm_cfg=norm_cfg, act_cfg=dict(type='ReLU'),
                       dtype=self.dtype, name=f'reg_convs{i}')
            for i in range(self.stacked_convs)]
        self.gfl_cls = nn.Conv(self.cls_out_channels, (3, 3),
                               padding=[(1, 1), (1, 1)], dtype=self.dtype,
                               kernel_init=normal_init(0.01),
                               bias_init=bias_prob_init(0.01),
                               name='gfl_cls')
        self.gfl_reg = nn.Conv(4 * (self.reg_max + 1), (3, 3),
                               padding=[(1, 1), (1, 1)], dtype=self.dtype,
                               kernel_init=normal_init(0.01),
                               name='gfl_reg')
        self.scales = self.param(
            'scales', nn.initializers.ones,
            (len(self.prior_generator.strides),))
        self._loss_dfl = build_loss(dict(
            self.loss_dfl or dict(type='DistributionFocalLoss',
                                  loss_weight=0.25)))

    def forward_single(self, x, lvl: int, train: bool = False):
        cls_feat = x
        reg_feat = x
        for conv in self.cls_convs:
            cls_feat = conv(cls_feat, train=train)
        for conv in self.reg_convs:
            reg_feat = conv(reg_feat, train=train)
        cls_score = self.gfl_cls(cls_feat)
        bbox_pred = (self.gfl_reg(reg_feat).astype(jnp.float32)
                     * self.scales[lvl])
        return cls_score, bbox_pred

    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        outs = [self.forward_single(f, i, train)
                for i, f in enumerate(feats)]
        return tuple(zip(*outs))

    @staticmethod
    def anchor_center(anchors):
        """(reference: gfl_head.py:196)."""
        return jnp.stack([(anchors[..., 0] + anchors[..., 2]) / 2,
                          (anchors[..., 1] + anchors[..., 3]) / 2], -1)

    # ------------------------------------------------------------- targets
    def _gfl_target_single(self, featmap_sizes, flat_anchors,
                           num_level_anchors, gt_bboxes, gt_valid,
                           gt_labels, img_shape, pad_shape):
        """ATSS assignment; bbox targets are RAW gt boxes (reference:
        gfl_head.py:611)."""
        cfg = self.train_cfg
        valid_flags = jnp.concatenate(
            self.prior_generator.valid_flags(featmap_sizes, pad_shape), 0)
        inside = anchor_inside_flags(flat_anchors, valid_flags, img_shape,
                                     cfg.get('allowed_border', -1))
        assign = self._assigner.assign(
            flat_anchors, num_level_anchors, gt_bboxes, gt_valid,
            gt_labels, bbox_valid=inside)
        pos = assign.gt_inds > 0
        bg = self.num_classes
        labels = jnp.where(pos, jnp.clip(assign.labels, 0), bg)
        pos_weight = cfg.get('pos_weight', -1)
        pw = 1.0 if pos_weight <= 0 else float(pos_weight)
        label_weights = jnp.where(
            pos, pw, jnp.where(assign.gt_inds == 0, 1.0, 0.0))
        g = gt_bboxes.shape[0]
        gt_idx = jnp.clip(assign.gt_inds - 1, 0, g - 1)
        bbox_targets = jnp.where(
            pos[:, None], jnp.take(gt_bboxes, gt_idx, axis=0), 0.0)
        return labels, label_weights, bbox_targets, pos

    # ---------------------------------------------------------------- loss
    def loss(self, rng, cls_scores, bbox_preds, gt_bboxes, gt_valid,
             gt_labels, img_shapes, pad_shapes) -> Dict[str, jnp.ndarray]:
        """(reference: gfl_head.py loss_single:209, loss:298)."""
        featmap_sizes = tuple((s.shape[1], s.shape[2]) for s in cls_scores)
        anchor_list = self.get_anchors(featmap_sizes)
        num_level_anchors = [int(a.shape[0]) for a in anchor_list]
        flat_anchors = jnp.concatenate(anchor_list, 0)
        strides = jnp.concatenate([
            jnp.full((n,), float(s[0] if isinstance(s, (tuple, list))
                                else s), jnp.float32)
            for n, s in zip(num_level_anchors,
                            self.prior_generator.strides)])
        b = gt_bboxes.shape[0]

        labels, label_weights, bbox_targets, pos = jax.vmap(
            lambda gb, gv, gl, sh, ps: self._gfl_target_single(
                featmap_sizes, flat_anchors, num_level_anchors, gb, gv,
                gl, sh, ps))(gt_bboxes, gt_valid, gt_labels, img_shapes,
                             pad_shapes)

        cls_flat = jnp.concatenate([
            s.reshape(b, -1, self.cls_out_channels) for s in cls_scores], 1)
        box_flat = jnp.concatenate([
            p.reshape(b, -1, 4 * (self.reg_max + 1))
            for p in bbox_preds], 1)

        centers = self.anchor_center(flat_anchors)[None] / strides[None, :,
                                                                   None]
        corners = integral(box_flat, self.reg_max)          # (B, N, 4)
        decoded_pred = distance2bbox(
            jnp.broadcast_to(centers, (b,) + centers.shape[1:]), corners)
        decoded_t = bbox_targets / strides[None, :, None]

        # quality (IoU) score for QFL; detached pred (reference :261)
        score = bbox_overlaps(jax.lax.stop_gradient(decoded_pred),
                              decoded_t, is_aligned=True)
        score = jnp.where(pos, score, 0.0)
        # cls-score-max weighting for reg losses, detached (reference :257)
        weight_t = jnp.max(jax.nn.sigmoid(
            jax.lax.stop_gradient(cls_flat.astype(jnp.float32))), -1)
        weight_t = jnp.where(pos, weight_t, 0.0)

        num_total = jnp.maximum(jnp.sum(pos).astype(jnp.float32), 1.0)
        loss_cls = self._loss_cls(
            cls_flat.reshape(-1, self.cls_out_channels),
            (labels.reshape(-1), score.reshape(-1)),
            weight=label_weights.reshape(-1), avg_factor=num_total)

        avg = jnp.maximum(jnp.sum(weight_t), 1e-6)
        loss_bbox = self._loss_bbox(
            decoded_pred.reshape(-1, 4), decoded_t.reshape(-1, 4),
            weight=weight_t.reshape(-1), avg_factor=avg)
        target_corners = bbox2distance(
            jnp.broadcast_to(centers, (b,) + centers.shape[1:]),
            decoded_t, max_dis=self.reg_max)                # (B, N, 4)
        loss_dfl = self._loss_dfl(
            box_flat.reshape(-1, self.reg_max + 1),
            target_corners.reshape(-1),
            weight=jnp.broadcast_to(weight_t[..., None],
                                    weight_t.shape + (4,)).reshape(-1),
            avg_factor=4.0 * avg)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_dfl=loss_dfl)

    # --------------------------------------------------------------- boxes
    def get_bboxes(self, cls_scores, bbox_preds, img_shapes, scale_factors,
                   cfg=None, rescale: bool = True, with_nms: bool = True):
        """(reference: gfl_head.py _get_bboxes:373 — integral decode at
        anchor centers × stride)."""
        cfg = dict(cfg or self.test_cfg)
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        anchors = self.get_anchors(featmap_sizes)
        stride_per_level = [s[0] if isinstance(s, (tuple, list)) else s
                            for s in self.prior_generator.strides]
        nms_pre = cfg.get('nms_pre', -1)
        b = cls_scores[0].shape[0]

        def per_image(scores_lvls, preds_lvls, img_shape, scale_factor):
            mlvl_boxes, mlvl_scores = [], []
            for lvl, (sc, bp) in enumerate(zip(scores_lvls, preds_lvls)):
                sc = jax.nn.sigmoid(
                    sc.reshape(-1, self.cls_out_channels)
                    .astype(jnp.float32))
                bp = bp.reshape(-1, 4 * (self.reg_max + 1))
                a = anchors[lvl]
                if 0 < nms_pre < sc.shape[0]:
                    from ...core.nms import fast_topk
                    _, topk = fast_topk(sc.max(-1), nms_pre)
                    sc, bp, a = sc[topk], bp[topk], a[topk]
                dist = integral(bp, self.reg_max) * \
                    float(stride_per_level[lvl])
                boxes = distance2bbox(self.anchor_center(a), dist,
                                      max_shape=img_shape)
                mlvl_boxes.append(boxes)
                mlvl_scores.append(sc)
            boxes = jnp.concatenate(mlvl_boxes, 0)
            scores = jnp.concatenate(mlvl_scores, 0)
            if rescale:
                boxes = boxes / scale_factor[None, :4]
            scores = jnp.concatenate(
                [scores, jnp.zeros_like(scores[:, :1])], -1)
            if not with_nms:
                return boxes, scores
            return multiclass_nms(boxes, scores, cfg['score_thr'],
                                  dict(cfg['nms']),
                                  cfg.get('max_per_img', 100))

        return jax.vmap(per_image)(
            [s.reshape(b, -1, self.cls_out_channels) for s in cls_scores],
            [p.reshape(b, -1, 4 * (self.reg_max + 1))
             for p in bbox_preds],
            img_shapes, scale_factors)
