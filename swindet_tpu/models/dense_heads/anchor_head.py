"""AnchorHead — anchor machinery + loss + box decoding.

TPU-native re-design of the reference's AnchorHead (reference:
mmdet/models/dense_heads/anchor_head.py:15 — get_anchors :145,
get_targets :273, loss :426, _get_bboxes :592). Differences by design:

- Targets are computed on the FULL anchor set with validity masks and
  fixed-size sampler slots scattered back (no unmap/dynamic subsets).
- Per-image ops (assign/sample/target build) are vmapped over the batch.
- Anchors for each static featmap size are trace-time constants.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import (HEADS, build_anchor_generator, build_assigner,
                       build_bbox_coder, build_loss, build_sampler)
from ...core.anchors import anchor_inside_flags, images_to_levels
from ...core.nms import multiclass_nms


@HEADS.register_module()
class AnchorHead(nn.Module):
    """Anchor-based dense head (single conv cls/reg by default)."""
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    anchor_generator: Optional[dict] = None
    bbox_coder: Optional[dict] = None
    reg_decoded_bbox: bool = False
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        ag = self.anchor_generator or dict(
            type='AnchorGenerator', scales=[8, 16, 32],
            ratios=[0.5, 1.0, 2.0], strides=[4, 8, 16, 32, 64])
        self.prior_generator = build_anchor_generator(dict(ag))
        self.num_base_priors = self.prior_generator.num_base_anchors[0]
        cfg_cls = self.loss_cls or dict(type='CrossEntropyLoss',
                                        use_sigmoid=True, loss_weight=1.0)
        self.use_sigmoid_cls = cfg_cls.get('use_sigmoid', False)
        self.cls_out_channels = (self.num_classes if self.use_sigmoid_cls
                                 else self.num_classes + 1)
        self._loss_cls = build_loss(dict(cfg_cls))
        cfg_bbox = self.loss_bbox or dict(type='L1Loss', loss_weight=1.0)
        self._loss_bbox = build_loss(dict(cfg_bbox))
        # GHM momentum>0 keeps a running per-bin density (reference:
        # ghm_loss.py acc_sum buffers) — a flax variable threaded
        # through the loss call functionally
        self._ghm_cls_acc = self.variable(
            'ghm', 'acc_sum_cls',
            lambda: jnp.zeros((int(cfg_cls.get('bins', 10)),),
                              jnp.float32)) \
            if (cfg_cls.get('type') == 'GHMC'
                and float(cfg_cls.get('momentum', 0)) > 0) else None
        self._ghm_bbox_acc = self.variable(
            'ghm', 'acc_sum_bbox',
            lambda: jnp.zeros((int(dict(cfg_bbox).get('bins', 10)),),
                              jnp.float32)) \
            if (dict(cfg_bbox).get('type') == 'GHMR'
                and float(dict(cfg_bbox).get('momentum', 0)) > 0) else None
        self._bbox_coder = build_bbox_coder(dict(
            self.bbox_coder or dict(type='DeltaXYWHBBoxCoder')))
        if self.train_cfg:
            self._assigner = build_assigner(dict(self.train_cfg['assigner']))
            # heads with pseudo-sampling (ATSS/GFL/FCOS-style) configure
            # no sampler (reference: atss_head.py:45 PseudoSampler)
            self._sampler = build_sampler(dict(
                self.train_cfg.get('sampler',
                                   dict(type='PseudoSampler'))))
        self._init_layers()

    def _init_layers(self):
        # reference anchor_head.py init_weights: normal_init(std=0.01)
        from ..layers import normal_init
        self.conv_cls = nn.Conv(
            self.num_base_priors * self.cls_out_channels, (1, 1),
            dtype=self.dtype, kernel_init=normal_init(0.01),
            name='conv_cls')
        self.conv_reg = nn.Conv(self.num_base_priors * 4, (1, 1),
                                dtype=self.dtype,
                                kernel_init=normal_init(0.01),
                                name='conv_reg')

    def forward_single(self, x, train: bool = False):
        return self.conv_cls(x), self.conv_reg(x)

    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        """Per level: (B, H, W, A*cls), (B, H, W, A*4)."""
        return tuple(zip(*[self.forward_single(f, train) for f in feats]))

    # ------------------------------------------------------------- anchors
    def get_anchors(self, featmap_sizes):
        return self.prior_generator.grid_anchors(featmap_sizes)

    # ------------------------------------------------------------- targets
    def _target_single(self, rng, featmap_sizes, flat_anchors, gt_bboxes,
                       gt_valid, gt_labels, img_shape, pad_shape):
        """Targets for one image on the full (concat-level) anchor set.
        Returns labels, label_weights, bbox_targets, bbox_weights,
        num_pos, num_neg (all full-set, reference: anchor_head.py:273)."""
        cfg = self.train_cfg
        valid_flags = jnp.concatenate(
            self.prior_generator.valid_flags(featmap_sizes, pad_shape), 0)
        inside = anchor_inside_flags(flat_anchors, valid_flags, img_shape,
                                     cfg.get('allowed_border', -1))
        assign = self._assigner.assign(
            flat_anchors, gt_bboxes, gt_valid,
            gt_labels if not self._is_rpn() else None,
            bbox_valid=inside)
        samp = self._sampler.sample(rng, assign, flat_anchors, gt_bboxes,
                                    gt_valid,
                                    gt_labels if not self._is_rpn() else None,
                                    bbox_valid=inside)
        n = flat_anchors.shape[0]
        bg = self.num_classes
        labels = jnp.full((n,), bg, jnp.int32)
        label_weights = jnp.zeros((n,), jnp.float32)
        bbox_targets = jnp.zeros((n, 4), jnp.float32)
        bbox_weights = jnp.zeros((n, 4), jnp.float32)

        # scatter sampled slots back onto the full anchor set
        inds = samp.inds
        pos = samp.is_pos
        sel = samp.valid
        if self._is_rpn():
            pos_labels = jnp.zeros_like(samp.pos_gt_labels)
        else:
            pos_labels = jnp.clip(samp.pos_gt_labels, 0)
        slot_labels = jnp.where(pos, pos_labels, bg)
        labels = labels.at[inds].set(
            jnp.where(sel, slot_labels, bg), mode='drop')
        pos_weight = cfg.get('pos_weight', -1)
        pw = 1.0 if pos_weight <= 0 else float(pos_weight)
        slot_lw = jnp.where(pos, pw, 1.0) * sel
        label_weights = label_weights.at[inds].add(
            jnp.where(sel, slot_lw, 0.0), mode='drop')

        if self.reg_decoded_bbox:
            slot_bt = samp.pos_gt_bboxes
        else:
            slot_bt = self._bbox_coder.encode(samp.bboxes,
                                              samp.pos_gt_bboxes)
        slot_bt = jnp.where(pos[:, None], slot_bt, 0.0)
        bbox_targets = bbox_targets.at[inds].set(slot_bt, mode='drop')
        bbox_weights = bbox_weights.at[inds].set(
            jnp.where(pos[:, None], 1.0, 0.0), mode='drop')
        return (labels, label_weights, bbox_targets, bbox_weights,
                samp.num_pos, samp.num_neg)

    IS_RPN = False

    def _is_rpn(self):
        return self.IS_RPN

    def get_targets(self, rng, featmap_sizes, anchor_list, gt_bboxes,
                    gt_valid, gt_labels, img_shapes, pad_shapes):
        """Batched targets. gt_bboxes: (B, G, 4); img/pad_shapes: (B, 2)."""
        b = gt_bboxes.shape[0]
        flat_anchors = jnp.concatenate(anchor_list, axis=0)
        rngs = jax.random.split(rng, b)
        fn = lambda r, gb, gv, gl, sh, ps: self._target_single(
            r, featmap_sizes, flat_anchors, gb, gv, gl, sh, ps)
        return jax.vmap(fn)(rngs, gt_bboxes, gt_valid, gt_labels,
                            img_shapes, pad_shapes)

    # ---------------------------------------------------------------- loss
    def loss(self, rng, cls_scores, bbox_preds, gt_bboxes, gt_valid,
             gt_labels, img_shapes, pad_shapes) -> Dict[str, jnp.ndarray]:
        """Batched loss (reference: anchor_head.py:426)."""
        featmap_sizes = tuple((s.shape[1], s.shape[2]) for s in cls_scores)
        anchor_list = self.get_anchors(featmap_sizes)
        (labels, label_weights, bbox_targets, bbox_weights, num_pos,
         num_neg) = self.get_targets(rng, featmap_sizes, anchor_list,
                                     gt_bboxes, gt_valid, gt_labels,
                                     img_shapes, pad_shapes)
        if self.sampling:
            # reference clamps PER-IMAGE counts to >= 1 (anchor_head.py
            # :356-357 `max(inds.numel(), 1)`)
            num_total = jnp.sum(jnp.maximum(num_pos, 1)
                                + jnp.maximum(num_neg, 1)) \
                .astype(jnp.float32)
        else:
            num_total = jnp.maximum(jnp.sum(num_pos).astype(jnp.float32), 1.)

        # flatten level preds to (B, N, ...) in anchor order
        cls_flat = jnp.concatenate([
            s.reshape(s.shape[0], -1, self.cls_out_channels)
            for s in cls_scores], axis=1)
        box_flat = jnp.concatenate([
            p.reshape(p.shape[0], -1, 4) for p in bbox_preds], axis=1)

        if self._ghm_cls_acc is not None:
            loss_cls, acc = self._loss_cls(
                cls_flat, labels, weight=label_weights,
                avg_factor=num_total, acc_sum=self._ghm_cls_acc.value)
            if not self.is_initializing():
                self._ghm_cls_acc.value = acc
        else:
            loss_cls = self._loss_cls(cls_flat, labels,
                                      weight=label_weights,
                                      avg_factor=num_total)
        if self.reg_decoded_bbox:
            anchors = jnp.concatenate(anchor_list, 0)
            box_flat = self._bbox_coder.decode(anchors[None], box_flat)
        if self._ghm_bbox_acc is not None:
            loss_bbox, acc = self._loss_bbox(
                box_flat, bbox_targets, weight=bbox_weights,
                avg_factor=num_total, acc_sum=self._ghm_bbox_acc.value)
            if not self.is_initializing():
                self._ghm_bbox_acc.value = acc
        else:
            loss_bbox = self._loss_bbox(box_flat, bbox_targets,
                                        weight=bbox_weights,
                                        avg_factor=num_total)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    @property
    def sampling(self):
        cfg_cls = self.loss_cls or {}
        return cfg_cls.get('type') not in ('FocalLoss', 'GHMC',
                                           'QualityFocalLoss')

    # --------------------------------------------------------------- boxes
    def get_bboxes(self, cls_scores, bbox_preds, img_shapes, scale_factors,
                   cfg=None, rescale: bool = False, with_nms: bool = True):
        """Batched decode + multiclass NMS (reference: anchor_head.py:592).
        Returns padded (B, max_per_img, 5) dets + labels + valid.
        With ``with_nms=False`` (TTA per-aug half, reference
        dense_test_mixins.py:60): returns the pre-NMS candidates
        (boxes (B, P, 4), scores (B, P, C+1)) instead."""
        cfg = cfg or self.test_cfg
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        anchors = self.get_anchors(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)

        def per_image(scores_lvls, preds_lvls, img_shape, scale_factor):
            mlvl_boxes, mlvl_scores, mlvl_valid = [], [], []
            for lvl, (score, pred) in enumerate(zip(scores_lvls, preds_lvls)):
                s = score.reshape(-1, self.cls_out_channels)
                p = pred.reshape(-1, 4)
                a = anchors[lvl]
                s = (jax.nn.sigmoid(s) if self.use_sigmoid_cls
                     else jax.nn.softmax(s, axis=-1))
                if 0 < nms_pre < s.shape[0]:
                    max_s = (s.max(-1) if self.use_sigmoid_cls
                             else s[:, :-1].max(-1))
                    from ...core.nms import fast_topk
                    _, topk = fast_topk(max_s, nms_pre)
                    s, p, a = s[topk], p[topk], a[topk]
                boxes = self._bbox_coder.decode(a, p, max_shape=img_shape)
                mlvl_boxes.append(boxes)
                mlvl_scores.append(s)
            boxes = jnp.concatenate(mlvl_boxes, 0)
            scores = jnp.concatenate(mlvl_scores, 0)
            if rescale:
                boxes = boxes / scale_factor[None, :4]
            if self.use_sigmoid_cls:
                # pad a background column for multiclass_nms convention
                scores = jnp.concatenate(
                    [scores, jnp.zeros_like(scores[:, :1])], axis=-1)
            if not with_nms:
                return boxes, scores
            return multiclass_nms(
                boxes, scores, cfg['score_thr'], dict(cfg['nms']),
                cfg.get('max_per_img', 100))

        b = cls_scores[0].shape[0]
        return jax.vmap(per_image)(
            [s.reshape(b, -1, self.cls_out_channels) for s in cls_scores],
            [p.reshape(b, -1, 4) for p in bbox_preds],
            img_shapes, scale_factors)
