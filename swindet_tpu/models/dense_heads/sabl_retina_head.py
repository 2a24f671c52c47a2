"""SABLRetinaHead (reference: mmdet/models/dense_heads/
sabl_retina_head.py:16; arXiv:1912.04260) — single square anchor per
location, side-aware bucket classification + in-bucket fine regression,
bucketing-guided rescoring at decode.

TPU-native: approx/square target assignment runs on the full padded
anchor set with validity masks (same redesign as GuidedAnchorHead)."""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import (HEADS, build_anchor_generator, build_assigner,
                       build_bbox_coder, build_loss, build_sampler)
from ..layers import ConvModule, bias_prob_init, normal_init
from ...core.anchors import anchor_inside_flags
from ...core.nms import fast_topk, multiclass_nms


@HEADS.register_module()
class SABLRetinaHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    stacked_convs: int = 4
    feat_channels: int = 256
    approx_anchor_generator: Optional[dict] = None
    square_anchor_generator: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    bbox_coder: Optional[dict] = None
    reg_decoded_bbox: bool = False
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox_cls: Optional[dict] = None
    loss_bbox_reg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.approx_gen = build_anchor_generator(dict(
            self.approx_anchor_generator or dict(
                type='AnchorGenerator', octave_base_scale=4,
                scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                strides=[8, 16, 32, 64, 128])))
        self.square_gen = build_anchor_generator(dict(
            self.square_anchor_generator or dict(
                type='AnchorGenerator', ratios=[1.0], scales=[4],
                strides=[8, 16, 32, 64, 128])))
        self.approxs_per_octave = self.approx_gen.num_base_anchors[0]
        self._bbox_coder = build_bbox_coder(dict(
            self.bbox_coder or dict(type='BucketingBBoxCoder',
                                    num_buckets=14, scale_factor=3.0)))
        self.side_num = self._bbox_coder.side_num
        cfg_cls = self.loss_cls or dict(type='FocalLoss',
                                        use_sigmoid=True, gamma=2.0,
                                        alpha=0.25, loss_weight=1.0)
        self.use_sigmoid_cls = cfg_cls.get('use_sigmoid', False)
        self.cls_out_channels = (self.num_classes if self.use_sigmoid_cls
                                 else self.num_classes + 1)
        self.sampling = cfg_cls.get('type') not in (
            'FocalLoss', 'GHMC', 'QualityFocalLoss')
        self._loss_cls = build_loss(dict(cfg_cls))
        self._loss_bbox_cls = build_loss(dict(
            self.loss_bbox_cls or dict(type='CrossEntropyLoss',
                                       use_sigmoid=True,
                                       loss_weight=1.5)))
        self._loss_bbox_reg = build_loss(dict(
            self.loss_bbox_reg or dict(type='SmoothL1Loss',
                                       beta=1.0 / 9.0, loss_weight=1.5)))
        if self.train_cfg:
            self._assigner = build_assigner(dict(
                self.train_cfg['assigner']))
            self._sampler = build_sampler(dict(
                self.train_cfg.get('sampler', dict(type='PseudoSampler'))))
        self.cls_convs = [
            ConvModule(self.feat_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, act_cfg=dict(type='ReLU'),
                       dtype=self.dtype, kernel_init=normal_init(0.01),
                       name=f'cls_convs{i}')
            for i in range(self.stacked_convs)]
        self.reg_convs = [
            ConvModule(self.feat_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, act_cfg=dict(type='ReLU'),
                       dtype=self.dtype, kernel_init=normal_init(0.01),
                       name=f'reg_convs{i}')
            for i in range(self.stacked_convs)]
        self.retina_cls = nn.Conv(
            self.cls_out_channels, (3, 3), padding=[(1, 1)] * 2,
            dtype=self.dtype, kernel_init=normal_init(0.01),
            bias_init=bias_prob_init(0.01), name='retina_cls')
        self.retina_bbox_reg = nn.Conv(
            self.side_num * 4, (3, 3), padding=[(1, 1)] * 2,
            dtype=self.dtype, kernel_init=normal_init(0.01),
            name='retina_bbox_reg')
        self.retina_bbox_cls = nn.Conv(
            self.side_num * 4, (3, 3), padding=[(1, 1)] * 2,
            dtype=self.dtype, kernel_init=normal_init(0.01),
            name='retina_bbox_cls')

    def forward_single(self, x, train: bool = False):
        cls_feat = x
        reg_feat = x
        for conv in self.cls_convs:
            cls_feat = conv(cls_feat, train=train)
        for conv in self.reg_convs:
            reg_feat = conv(reg_feat, train=train)
        cls_score = self.retina_cls(cls_feat)
        bbox_cls_pred = self.retina_bbox_cls(reg_feat)
        bbox_reg_pred = self.retina_bbox_reg(reg_feat)
        return cls_score, (bbox_cls_pred, bbox_reg_pred)

    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        return tuple(zip(*[self.forward_single(f, train) for f in feats]))

    # ----------------------------------------------------------- targets
    def _target_single(self, rng, featmap_sizes, squares, approxs,
                       gt_bboxes, gt_valid, gt_labels, img_shape,
                       pad_shape):
        k = self.approxs_per_octave
        sq_flags = []
        for af in self.approx_gen.valid_flags(featmap_sizes, pad_shape):
            sq_flags.append(af.reshape(-1, k).any(-1))
        sq_valid = jnp.concatenate(sq_flags, 0)
        inside = anchor_inside_flags(
            squares, sq_valid, img_shape,
            self.train_cfg.get('allowed_border', -1))
        assign = self._assigner.assign(
            squares, gt_bboxes, gt_valid, gt_labels, bbox_valid=inside,
            approxs=approxs, approxs_per_octave=k)
        samp = self._sampler.sample(rng, assign, squares, gt_bboxes,
                                    gt_valid, gt_labels,
                                    bbox_valid=inside)
        n = squares.shape[0]
        s4 = self.side_num * 4
        bg = self.num_classes
        labels = jnp.full((n,), bg, jnp.int32)
        label_weights = jnp.zeros((n,), jnp.float32)
        pos = samp.is_pos
        sel = samp.valid
        labels = labels.at[samp.inds].set(
            jnp.where(sel & pos, jnp.clip(samp.pos_gt_labels, 0), bg),
            mode='drop')
        pw = self.train_cfg.get('pos_weight', -1)
        pw = 1.0 if pw <= 0 else float(pw)
        label_weights = label_weights.at[samp.inds].add(
            jnp.where(sel, jnp.where(pos, pw, 1.0), 0.0), mode='drop')

        offs, ow, blab, cw = self._bbox_coder.encode(samp.bboxes,
                                                     samp.pos_gt_bboxes)
        posm = pos[:, None].astype(jnp.float32)
        cls_t = jnp.zeros((n, s4), jnp.float32).at[samp.inds].set(
            blab * posm, mode='drop')
        cls_w = jnp.zeros((n, s4), jnp.float32).at[samp.inds].set(
            cw * posm, mode='drop')
        reg_t = jnp.zeros((n, s4), jnp.float32).at[samp.inds].set(
            offs * posm, mode='drop')
        reg_w = jnp.zeros((n, s4), jnp.float32).at[samp.inds].set(
            ow * posm, mode='drop')
        return (labels, label_weights, cls_t, cls_w, reg_t, reg_w,
                samp.num_pos, samp.num_neg)

    # -------------------------------------------------------------- loss
    def loss(self, rng, cls_scores, bbox_preds, gt_bboxes, gt_valid,
             gt_labels, img_shapes, pad_shapes) -> Dict[str, jnp.ndarray]:
        featmap_sizes = tuple((s.shape[1], s.shape[2])
                              for s in cls_scores)
        squares = jnp.concatenate(
            self.square_gen.grid_anchors(featmap_sizes), 0)
        approxs = jnp.concatenate(
            self.approx_gen.grid_anchors(featmap_sizes), 0)
        b = gt_bboxes.shape[0]
        rngs = jax.random.split(rng, b)
        (labels, label_weights, cls_t, cls_w, reg_t, reg_w, num_pos,
         num_neg) = jax.vmap(
            lambda r, gb, gv, gl, sh, ps: self._target_single(
                r, featmap_sizes, squares, approxs, gb, gv, gl, sh, ps))(
            rngs, gt_bboxes, gt_valid, gt_labels, img_shapes, pad_shapes)
        if self.sampling:
            num_total = jnp.maximum(
                jnp.sum(num_pos + num_neg).astype(jnp.float32), 1.0)
        else:
            num_total = jnp.maximum(
                jnp.sum(num_pos).astype(jnp.float32), 1.0)

        s4 = self.side_num * 4
        cls_flat = jnp.concatenate([
            s.astype(jnp.float32).reshape(b, -1, self.cls_out_channels)
            for s in cls_scores], 1)
        bcp = jnp.concatenate([
            p[0].astype(jnp.float32).reshape(b, -1, s4)
            for p in bbox_preds], 1)
        brp = jnp.concatenate([
            p[1].astype(jnp.float32).reshape(b, -1, s4)
            for p in bbox_preds], 1)
        loss_cls = self._loss_cls(cls_flat, labels, weight=label_weights,
                                  avg_factor=num_total)
        # per-bucket sigmoid BCE with same-shape binary targets
        # (reference loss_single :458: pred (N, 4*side) vs one-hot
        # bucket labels, elementwise)
        loss_bbox_cls = self._loss_bbox_cls(
            bcp, cls_t, weight=cls_w,
            avg_factor=num_total * 4 * self.side_num)
        loss_bbox_reg = self._loss_bbox_reg(
            brp, reg_t, weight=reg_w,
            avg_factor=num_total * 4 * self._bbox_coder.offset_topk)
        return dict(loss_cls=loss_cls, loss_bbox_cls=loss_bbox_cls,
                    loss_bbox_reg=loss_bbox_reg)

    # ------------------------------------------------------------- boxes
    def get_bboxes(self, cls_scores, bbox_preds, img_shapes,
                   scale_factors, cfg=None, rescale: bool = True,
                   with_nms: bool = True):
        cfg = dict(cfg or self.test_cfg)
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        anchors = self.square_gen.grid_anchors(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)
        b = cls_scores[0].shape[0]
        s4 = self.side_num * 4

        def per_image(scores_lvls, bcp_lvls, brp_lvls, img_shape,
                      scale_factor):
            mlvl_boxes, mlvl_scores, mlvl_conf = [], [], []
            for lvl in range(len(scores_lvls)):
                sc = scores_lvls[lvl].reshape(-1, self.cls_out_channels)
                sc = (jax.nn.sigmoid(sc) if self.use_sigmoid_cls
                      else jax.nn.softmax(sc, -1))
                bc = bcp_lvls[lvl].reshape(-1, s4)
                br = brp_lvls[lvl].reshape(-1, s4)
                a = anchors[lvl]
                if 0 < nms_pre < sc.shape[0]:
                    ms = (sc.max(-1) if self.use_sigmoid_cls
                          else sc[:, :-1].max(-1))
                    _, topk = fast_topk(ms, nms_pre)
                    sc, bc, br, a = sc[topk], bc[topk], br[topk], a[topk]
                boxes, conf = self._bbox_coder.decode(
                    a, (bc, br), max_shape=img_shape)
                mlvl_boxes.append(boxes)
                mlvl_scores.append(sc)
                mlvl_conf.append(conf)
            boxes = jnp.concatenate(mlvl_boxes, 0)
            scores = jnp.concatenate(mlvl_scores, 0)
            conf = jnp.concatenate(mlvl_conf, 0)
            if rescale:
                boxes = boxes / scale_factor[None, :4]
            if self.use_sigmoid_cls:
                scores = jnp.concatenate(
                    [scores, jnp.zeros_like(scores[:, :1])], -1)
            if not with_nms:
                return boxes, scores, conf
            return multiclass_nms(boxes, scores, cfg['score_thr'],
                                  dict(cfg['nms']),
                                  cfg.get('max_per_img', 100),
                                  score_factors=conf)

        return jax.vmap(per_image)(
            [s.astype(jnp.float32).reshape(b, -1, self.cls_out_channels)
             for s in cls_scores],
            [p[0].astype(jnp.float32).reshape(b, -1, s4)
             for p in bbox_preds],
            [p[1].astype(jnp.float32).reshape(b, -1, s4)
             for p in bbox_preds],
            img_shapes, scale_factors)
