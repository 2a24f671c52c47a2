"""ATSSHead (reference: mmdet/models/dense_heads/atss_head.py:16 —
Adaptive Training Sample Selection, arXiv:1912.02424).

TPU-native: ATSS assignment runs on the FULL padded anchor set with
validity masks (core/bbox/assigners.py ATSSAssigner); the per-level
top-k candidate selection happens on static per-level slabs; losses are
full-set masked reductions (no pos_inds gathers).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS, build_loss
from ..layers import ConvModule, bias_prob_init, normal_init
from ...core.anchors import anchor_inside_flags
from ...core.nms import multiclass_nms
from .anchor_head import AnchorHead


@HEADS.register_module()
class ATSSHead(AnchorHead):
    """Anchor-based head with FCOS-style towers + centerness, ATSS
    assignment (reference: atss_head.py loss_single:146,
    centerness_target:299)."""
    stacked_convs: int = 4
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None   # default GN(32) applied in layers
    loss_centerness: Optional[dict] = None

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
        self.atss_cls = nn.Conv(
            self.num_base_priors * self.cls_out_channels, (3, 3),
            padding=[(1, 1), (1, 1)], dtype=self.dtype,
            kernel_init=normal_init(0.01), bias_init=bias_prob_init(0.01),
            name='atss_cls')
        self.atss_reg = nn.Conv(self.num_base_priors * 4, (3, 3),
                                padding=[(1, 1), (1, 1)], dtype=self.dtype,
                                kernel_init=normal_init(0.01),
                                name='atss_reg')
        self.atss_centerness = nn.Conv(
            self.num_base_priors, (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.dtype, kernel_init=normal_init(0.01),
            name='atss_centerness')
        self.scales = self.param(
            'scales', nn.initializers.ones,
            (len(self.prior_generator.strides),))
        self._loss_centerness = build_loss(dict(
            self.loss_centerness or dict(type='CrossEntropyLoss',
                                         use_sigmoid=True,
                                         loss_weight=1.0)))

    def forward_single(self, x, lvl: int, train: bool = False):
        cls_feat = x
        reg_feat = x
        for conv in self.cls_convs:
            cls_feat = conv(cls_feat, train=train)
        for conv in self.reg_convs:
            reg_feat = conv(reg_feat, train=train)
        cls_score = self.atss_cls(cls_feat)
        # no exp on reg (reference :141)
        bbox_pred = (self.atss_reg(reg_feat).astype(jnp.float32)
                     * self.scales[lvl])
        centerness = self.atss_centerness(reg_feat)
        return cls_score, bbox_pred, centerness

    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        outs = [self.forward_single(f, i, train)
                for i, f in enumerate(feats)]
        return tuple(zip(*outs))

    # ------------------------------------------------------------- targets
    def _atss_target_single(self, featmap_sizes, flat_anchors,
                            num_level_anchors, gt_bboxes, gt_valid,
                            gt_labels, img_shape, pad_shape):
        """Full-set masked ATSS targets for one image (reference:
        atss_head.py _get_target_single:574; PseudoSampler semantics —
        every non-ignored inside anchor participates)."""
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
        pos_gt = jnp.take(gt_bboxes, gt_idx, axis=0)
        enc = self._bbox_coder.encode(flat_anchors, pos_gt)
        bbox_targets = jnp.where(pos[:, None], enc, 0.0)
        return labels, label_weights, bbox_targets, pos

    @staticmethod
    def centerness_target(anchors, gts):
        """sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b))) wrt anchor
        centers (reference: atss_head.py:299)."""
        cx = (anchors[..., 0] + anchors[..., 2]) / 2
        cy = (anchors[..., 1] + anchors[..., 3]) / 2
        l_ = cx - gts[..., 0]
        t_ = cy - gts[..., 1]
        r_ = gts[..., 2] - cx
        b_ = gts[..., 3] - cy
        lr_min = jnp.minimum(l_, r_)
        lr_max = jnp.maximum(jnp.maximum(l_, r_), 1e-12)
        tb_min = jnp.minimum(t_, b_)
        tb_max = jnp.maximum(jnp.maximum(t_, b_), 1e-12)
        c = (lr_min / lr_max) * (tb_min / tb_max)
        return jnp.sqrt(jnp.clip(c, 0.0))

    # ---------------------------------------------------------------- loss
    def loss(self, rng, cls_scores, bbox_preds, centernesses, gt_bboxes,
             gt_valid, gt_labels, img_shapes,
             pad_shapes) -> Dict[str, jnp.ndarray]:
        """(reference: atss_head.py loss:224)."""
        featmap_sizes = tuple((s.shape[1], s.shape[2]) for s in cls_scores)
        anchor_list = self.get_anchors(featmap_sizes)
        num_level_anchors = [int(a.shape[0]) for a in anchor_list]
        flat_anchors = jnp.concatenate(anchor_list, 0)
        b = gt_bboxes.shape[0]

        labels, label_weights, bbox_targets, pos = jax.vmap(
            lambda gb, gv, gl, sh, ps: self._atss_target_single(
                featmap_sizes, flat_anchors, num_level_anchors, gb, gv,
                gl, sh, ps))(gt_bboxes, gt_valid, gt_labels, img_shapes,
                             pad_shapes)

        cls_flat = jnp.concatenate([
            s.reshape(b, -1, self.cls_out_channels) for s in cls_scores], 1)
        box_flat = jnp.concatenate([
            p.reshape(b, -1, 4) for p in bbox_preds], 1)
        cness_flat = jnp.concatenate([
            c.reshape(b, -1) for c in centernesses], 1)

        num_total = jnp.maximum(jnp.sum(pos).astype(jnp.float32), 1.0)
        loss_cls = self._loss_cls(
            cls_flat.reshape(-1, self.cls_out_channels),
            labels.reshape(-1), weight=label_weights.reshape(-1),
            avg_factor=num_total)

        anchors_b = jnp.broadcast_to(flat_anchors[None],
                                     (b,) + flat_anchors.shape)
        decoded_pred = self._bbox_coder.decode(anchors_b, box_flat)
        decoded_t = self._bbox_coder.decode(anchors_b, bbox_targets)
        cness_t = self.centerness_target(anchors_b, decoded_t)
        cness_t = jnp.where(pos, cness_t, 0.0)
        # reference: bbox loss weighted by centerness target, normalized
        # by the (globally reduced) sum of centerness targets (:289-293)
        bbox_avg = jnp.maximum(jnp.sum(cness_t), 1e-6)
        loss_bbox = self._loss_bbox(
            decoded_pred.reshape(-1, 4), decoded_t.reshape(-1, 4),
            weight=cness_t.reshape(-1), avg_factor=bbox_avg)
        loss_centerness = self._loss_centerness(
            cness_flat.reshape(-1), cness_t.reshape(-1),
            weight=pos.reshape(-1).astype(jnp.float32),
            avg_factor=num_total)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_centerness=loss_centerness)

    # --------------------------------------------------------------- boxes
    def get_bboxes(self, cls_scores, bbox_preds, centernesses, img_shapes,
                   scale_factors, cfg=None, rescale: bool = True,
                   with_nms: bool = True):
        """(reference: atss_head.py _get_bboxes:377 — nms_pre ranked by
        scores*centerness; centerness enters NMS as score_factors).
        ``with_nms=False`` returns pre-NMS (boxes, scores, centerness)
        for the TTA merge (dense_test_mixins.py:60)."""
        cfg = dict(cfg or self.test_cfg)
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        anchors = self.get_anchors(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)
        b = cls_scores[0].shape[0]

        def per_image(scores_lvls, preds_lvls, cness_lvls, img_shape,
                      scale_factor):
            mlvl_boxes, mlvl_scores, mlvl_cness = [], [], []
            for lvl, (sc, bp, cn) in enumerate(zip(scores_lvls, preds_lvls,
                                                   cness_lvls)):
                sc = jax.nn.sigmoid(
                    sc.reshape(-1, self.cls_out_channels)
                    .astype(jnp.float32))
                cn = jax.nn.sigmoid(cn.reshape(-1).astype(jnp.float32))
                bp = bp.reshape(-1, 4)
                a = anchors[lvl]
                if 0 < nms_pre < sc.shape[0]:
                    from ...core.nms import fast_topk
                    _, topk = fast_topk((sc * cn[:, None]).max(-1),
                                        nms_pre)
                    sc, bp, cn, a = sc[topk], bp[topk], cn[topk], a[topk]
                boxes = self._bbox_coder.decode(a, bp, max_shape=img_shape)
                mlvl_boxes.append(boxes)
                mlvl_scores.append(sc)
                mlvl_cness.append(cn)
            boxes = jnp.concatenate(mlvl_boxes, 0)
            scores = jnp.concatenate(mlvl_scores, 0)
            cness = jnp.concatenate(mlvl_cness, 0)
            if rescale:
                boxes = boxes / scale_factor[None, :4]
            scores = jnp.concatenate(
                [scores, jnp.zeros_like(scores[:, :1])], -1)
            if not with_nms:
                return boxes, scores, cness
            return multiclass_nms(boxes, scores, cfg['score_thr'],
                                  dict(cfg['nms']),
                                  cfg.get('max_per_img', 100),
                                  score_factors=cness)

        return jax.vmap(per_image)(
            [s.reshape(b, -1, self.cls_out_channels) for s in cls_scores],
            [p.reshape(b, -1, 4) for p in bbox_preds],
            [c.reshape(b, -1) for c in centernesses],
            img_shapes, scale_factors)
