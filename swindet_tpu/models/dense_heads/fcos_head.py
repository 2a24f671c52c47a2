"""FCOS head (reference: mmdet/models/dense_heads/fcos_head.py) —
anchor-free per-pixel (l, t, r, b) regression with centerness.

TPU-native: per-level regression ranges become static masks over the
full point set; targets vmapped per image; scale params per level.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS, build_loss
from ..layers import ConvModule, bias_prob_init, normal_init
from ...core.anchors import PointGenerator
from ...core.bbox.coders import distance2bbox
from ...core.nms import multiclass_nms

INF = 1e8


@HEADS.register_module()
class FCOSHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    regress_ranges: Sequence[Tuple[float, float]] = (
        (-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))
    center_sampling: bool = False
    center_sample_radius: float = 1.5
    norm_on_bbox: bool = False
    centerness_on_reg: bool = False
    dcn_on_last_conv: bool = False
    conv_bias: Any = 'auto'
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    loss_centerness: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.point_generator = PointGenerator()
        self._loss_cls = build_loss(dict(
            self.loss_cls or dict(type='FocalLoss', use_sigmoid=True,
                                  gamma=2.0, alpha=0.25,
                                  loss_weight=1.0)))
        self._loss_bbox = build_loss(dict(
            self.loss_bbox or dict(type='IoULoss', loss_weight=1.0)))
        self._loss_centerness = build_loss(dict(
            self.loss_centerness or dict(type='CrossEntropyLoss',
                                         use_sigmoid=True,
                                         loss_weight=1.0)))
        self.cls_convs, self.reg_convs = self._build_towers()
        self.conv_cls = nn.Conv(self.num_classes, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                kernel_init=normal_init(0.01),
                                bias_init=bias_prob_init(0.01),
                                name='conv_cls')
        self.conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2,
                                dtype=self.dtype,
                                kernel_init=normal_init(0.01),
                                name='conv_reg')
        self.conv_centerness = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2,
                                       dtype=self.dtype,
                                       kernel_init=normal_init(0.01),
                                       name='conv_centerness')
        self.scales = self.param('scales', nn.initializers.ones,
                                 (len(self.strides),))

    def _build_towers(self):
        """Stacked 3x3 conv towers; overridden by NASFCOSHead with the
        searched ops (reference: nasfcos_head.py:21 _init_layers)."""
        def conv_cfg_of(i):
            if self.dcn_on_last_conv and i == self.stacked_convs - 1:
                return dict(type='DCNv2')   # reference fcos_head.py:107
            return None
        cls_convs = [
            ConvModule(self.feat_channels, 3, padding=1,
                       conv_cfg=conv_cfg_of(i), bias=self.conv_bias,
                       norm_cfg=self.norm_cfg, act_cfg=dict(type='ReLU'),
                       dtype=self.dtype, name=f'cls_convs{i}')
            for i in range(self.stacked_convs)]
        reg_convs = [
            ConvModule(self.feat_channels, 3, padding=1,
                       conv_cfg=conv_cfg_of(i), bias=self.conv_bias,
                       norm_cfg=self.norm_cfg, act_cfg=dict(type='ReLU'),
                       dtype=self.dtype, name=f'reg_convs{i}')
            for i in range(self.stacked_convs)]
        return cls_convs, reg_convs

    def forward_single(self, x, lvl: int, train: bool = False):
        cls_feat = x
        reg_feat = x
        for conv in self.cls_convs:
            cls_feat = conv(cls_feat, train=train)
        for conv in self.reg_convs:
            reg_feat = conv(reg_feat, train=train)
        cls_score = self.conv_cls(cls_feat)
        bbox_pred = self.conv_reg(reg_feat) * self.scales[lvl]
        bbox_pred = bbox_pred.astype(jnp.float32)
        if self.norm_on_bbox:
            # stride-normalized regression (reference fcos_head.py:148):
            # relu'd raw units in training, scaled to pixels at test time
            bbox_pred = jax.nn.relu(bbox_pred)
            if not train:
                bbox_pred = bbox_pred * self.strides[lvl]
        else:
            bbox_pred = jnp.exp(bbox_pred)
        cness_feat = reg_feat if self.centerness_on_reg else cls_feat
        centerness = self.conv_centerness(cness_feat)
        return cls_score, bbox_pred, centerness

    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        outs = [self.forward_single(f, i, train)
                for i, f in enumerate(feats)]
        return tuple(zip(*outs))

    # ------------------------------------------------------------- targets
    def _get_points(self, featmap_sizes):
        pts = []
        for fs, s in zip(featmap_sizes, self.strides):
            p = self.point_generator.grid_points(fs, s)
            pts.append(jnp.stack([p[:, 0] + s // 2, p[:, 1] + s // 2], -1))
        return pts

    def _target_single(self, points, strides_pts, ranges, gt_bboxes,
                       gt_valid, gt_labels):
        """(reference fcos_head get_target_single). points (N, 2);
        strides_pts (N,) per-point level stride; ranges (N, 2); gts
        padded (G, ...)."""
        n = points.shape[0]
        g = gt_bboxes.shape[0]
        areas = ((gt_bboxes[:, 2] - gt_bboxes[:, 0]) *
                 (gt_bboxes[:, 3] - gt_bboxes[:, 1]))
        areas = jnp.where(gt_valid, areas, INF)

        xs = points[:, 0][:, None]
        ys = points[:, 1][:, None]
        left = xs - gt_bboxes[None, :, 0]
        right = gt_bboxes[None, :, 2] - xs
        top = ys - gt_bboxes[None, :, 1]
        bottom = gt_bboxes[None, :, 3] - ys
        ltrb = jnp.stack([left, top, right, bottom], -1)   # (N, G, 4)

        if self.center_sampling:
            # positives must fall in a radius*stride box around the gt
            # center, clipped to the gt box (reference fcos_head.py:556)
            r = (strides_pts * self.center_sample_radius)[:, None]
            cx = ((gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5)[None]
            cy = ((gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5)[None]
            x0 = jnp.maximum(cx - r, gt_bboxes[None, :, 0])
            y0 = jnp.maximum(cy - r, gt_bboxes[None, :, 1])
            x1 = jnp.minimum(cx + r, gt_bboxes[None, :, 2])
            y1 = jnp.minimum(cy + r, gt_bboxes[None, :, 3])
            cb = jnp.stack([xs - x0, ys - y0, x1 - xs, y1 - ys], -1)
            inside = cb.min(-1) > 0
        else:
            inside = ltrb.min(-1) > 0
        maxd = ltrb.max(-1)
        in_range = (maxd >= ranges[:, None, 0]) & \
                   (maxd <= ranges[:, None, 1])
        ok = inside & in_range & gt_valid[None]
        area_mat = jnp.where(ok, areas[None], INF)
        min_area = area_mat.min(-1)
        gt_idx = area_mat.argmin(-1)
        pos = min_area < INF

        labels = jnp.where(pos,
                           jnp.take(gt_labels.astype(jnp.int32), gt_idx),
                           self.num_classes)
        bbox_targets = jnp.take_along_axis(
            ltrb, gt_idx[:, None, None], axis=1)[:, 0]     # (N, 4)
        return labels, bbox_targets, pos

    @staticmethod
    def centerness_target(t):
        lr = t[..., [0, 2]]
        tb = t[..., [1, 3]]
        c = (lr.min(-1) / jnp.clip(lr.max(-1), 1e-6) *
             (tb.min(-1) / jnp.clip(tb.max(-1), 1e-6)))
        return jnp.sqrt(jnp.clip(c, 0.0))

    # ---------------------------------------------------------------- loss
    def loss(self, rng, cls_scores, bbox_preds, centernesses, gt_bboxes,
             gt_valid, gt_labels, img_shapes,
             pad_shapes) -> Dict[str, jnp.ndarray]:
        featmap_sizes = tuple((s.shape[1], s.shape[2]) for s in cls_scores)
        pts = self._get_points(featmap_sizes)
        all_pts = jnp.concatenate(pts, 0)
        ranges = jnp.concatenate([
            jnp.broadcast_to(jnp.asarray(r, jnp.float32)[None],
                             (p.shape[0], 2))
            for p, r in zip(pts, self.regress_ranges)], 0)
        strides_pts = jnp.concatenate([
            jnp.full((p.shape[0],), s, jnp.float32)
            for p, s in zip(pts, self.strides)], 0)
        b = gt_bboxes.shape[0]

        labels, bbox_t, pos = jax.vmap(
            lambda gb, gv, gl: self._target_single(
                all_pts, strides_pts, ranges, gb, gv, gl))(
                    gt_bboxes, gt_valid, gt_labels)
        if self.norm_on_bbox:
            # targets in stride units to match the relu'd train-mode
            # predictions (reference fcos_head.py:524)
            bbox_t = bbox_t / strides_pts[None, :, None]

        cls_flat = jnp.concatenate(
            [s.reshape(b, -1, self.num_classes) for s in cls_scores], 1)
        reg_flat = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in bbox_preds], 1)
        cness_flat = jnp.concatenate(
            [c.reshape(b, -1) for c in centernesses], 1)

        num_pos = jnp.maximum(jnp.sum(pos).astype(jnp.float32), 1.0)
        loss_cls = self._loss_cls(
            cls_flat.reshape(-1, self.num_classes), labels.reshape(-1),
            weight=jnp.ones_like(labels.reshape(-1), jnp.float32),
            avg_factor=num_pos)

        cness_t = self.centerness_target(bbox_t)
        pts_b = jnp.broadcast_to(all_pts[None], (b,) + all_pts.shape)
        decoded = distance2bbox(pts_b, reg_flat)
        decoded_t = distance2bbox(pts_b, bbox_t)
        denom = jnp.maximum(jnp.sum(jnp.where(pos, cness_t, 0.0)), 1e-6)
        loss_bbox = self._loss_bbox(
            decoded.reshape(-1, 4), decoded_t.reshape(-1, 4),
            weight=jnp.where(pos, cness_t, 0.0).reshape(-1),
            avg_factor=denom)
        # soft BCE against the CONTINUOUS centerness target (reference
        # fcos_head.py:245 — binarizing it changes the loss)
        loss_cness = self._loss_centerness(
            cness_flat.reshape(-1),
            jnp.where(pos, cness_t, 0.0).reshape(-1),
            weight=pos.reshape(-1).astype(jnp.float32),
            avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_centerness=loss_cness)

    # --------------------------------------------------------------- boxes
    def get_bboxes(self, cls_scores, bbox_preds, centernesses,
                   img_shapes, scale_factors, cfg=None,
                   rescale: bool = True, with_nms: bool = True):
        cfg = dict(cfg or self.test_cfg)
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        pts = self._get_points(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)
        b = cls_scores[0].shape[0]

        def per_image(scores_lvls, preds_lvls, cness_lvls, img_shape,
                      scale_factor):
            mlvl_boxes, mlvl_scores, mlvl_cness = [], [], []
            for p, (sc, bp, cn) in zip(pts, zip(scores_lvls, preds_lvls,
                                                cness_lvls)):
                sc = jax.nn.sigmoid(
                    sc.reshape(-1, self.num_classes).astype(jnp.float32))
                cn = jax.nn.sigmoid(
                    cn.reshape(-1).astype(jnp.float32))
                bp = bp.reshape(-1, 4)
                if 0 < nms_pre < sc.shape[0]:
                    from ...core.nms import fast_topk
                    _, topk = fast_topk(sc.max(-1) * cn, nms_pre)
                    sc, bp, cn, pp = sc[topk], bp[topk], cn[topk], p[topk]
                else:
                    pp = p
                boxes = distance2bbox(pp, bp, max_shape=img_shape)
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
            [s.reshape(b, -1, self.num_classes) for s in cls_scores],
            [p.reshape(b, -1, 4) for p in bbox_preds],
            [c.reshape(b, -1) for c in centernesses],
            img_shapes, scale_factors)
