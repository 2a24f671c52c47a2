"""RepPoints head (reference: mmdet/models/dense_heads/
reppoints_head.py:14 — points2bbox :165, forward_single :253 with
DeformConv2d at predicted offsets :283-287, init/refine targets
:374-529, losses :530-663).

TPU-native re-design: targets are computed on the FULL point set with
validity masks (PointAssigner for the init stage, MaxIoUAssigner on
init-predicted boxes for refine); the deformable conv is the
gather-based Pallas/lax op (ops/deform_conv.py).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import (HEADS, build_assigner, build_loss)
from ..layers import ConvModule, bias_prob_init, normal_init
from ...core.anchors import PointGenerator
from ...core.nms import multiclass_nms
from ...ops.deform_conv import DeformConv2d


@HEADS.register_module()
class RepPointsHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_points: int = 9
    gradient_mul: float = 0.1
    point_strides: Sequence[int] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    transform_method: str = 'moment'
    moment_mul: float = 0.01
    use_grid_points: bool = False
    center_init: bool = True
    norm_cfg: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox_init: Optional[dict] = None
    loss_bbox_refine: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.point_generator = PointGenerator()
        self.cls_out_channels = self.num_classes  # focal/sigmoid
        self._loss_cls = build_loss(dict(
            self.loss_cls or dict(type='FocalLoss', use_sigmoid=True,
                                  gamma=2.0, alpha=0.25,
                                  loss_weight=1.0)))
        self._loss_bbox_init = build_loss(dict(
            self.loss_bbox_init or dict(type='SmoothL1Loss',
                                        beta=1.0 / 9.0,
                                        loss_weight=0.5)))
        self._loss_bbox_refine = build_loss(dict(
            self.loss_bbox_refine or dict(type='SmoothL1Loss',
                                          beta=1.0 / 9.0,
                                          loss_weight=1.0)))
        if self.train_cfg:
            self._init_assigner = build_assigner(
                dict(dict(self.train_cfg)['init']['assigner']))
            self._refine_assigner = build_assigner(
                dict(dict(self.train_cfg)['refine']['assigner']))

        # dcn base offsets (reference :70-77): 3x3 grid, y-first
        k = int(np.sqrt(self.num_points))
        base = np.stack(np.meshgrid(
            np.arange(k) - k // 2, np.arange(k) - k // 2,
            indexing='ij'), -1).reshape(-1, 2)      # (K, 2) (dy, dx)
        self.dcn_base_offset = base.astype(np.float32)

        self.cls_convs = [
            ConvModule(self.feat_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg,
                       act_cfg=dict(type='ReLU'), dtype=self.dtype,
                       name=f'cls_convs{i}')
            for i in range(self.stacked_convs)]
        self.reg_convs = [
            ConvModule(self.feat_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg,
                       act_cfg=dict(type='ReLU'), dtype=self.dtype,
                       name=f'reg_convs{i}')
            for i in range(self.stacked_convs)]
        # grid mode regresses a box (4) and derives the point grid from
        # it (reference reppoints_head.py gen_grid_from_reg)
        pts_out = 4 if self.use_grid_points else 2 * self.num_points
        self.reppoints_cls_conv = DeformConv2d(
            self.point_feat_channels, (3, 3), dtype=self.dtype,
            name='reppoints_cls_conv')
        self.reppoints_cls_out = nn.Conv(
            self.cls_out_channels, (1, 1), dtype=self.dtype,
            kernel_init=normal_init(0.01), bias_init=bias_prob_init(0.01),
            name='reppoints_cls_out')
        self.reppoints_pts_init_conv = nn.Conv(
            self.point_feat_channels, (3, 3), padding=[(1, 1)] * 2,
            dtype=self.dtype, name='reppoints_pts_init_conv')
        self.reppoints_pts_init_out = nn.Conv(
            pts_out, (1, 1), dtype=self.dtype,
            kernel_init=normal_init(0.01),
            name='reppoints_pts_init_out')
        self.reppoints_pts_refine_conv = DeformConv2d(
            self.point_feat_channels, (3, 3), dtype=self.dtype,
            name='reppoints_pts_refine_conv')
        self.reppoints_pts_refine_out = nn.Conv(
            pts_out, (1, 1), dtype=self.dtype,
            kernel_init=normal_init(0.01),
            name='reppoints_pts_refine_out')
        if self.transform_method == 'moment':
            self.moment_transfer = self.param(
                'moment_transfer', nn.initializers.zeros, (2,))

    # -------------------------------------------------------------- utils
    def points2bbox(self, pts: jnp.ndarray,
                    y_first: bool = True) -> jnp.ndarray:
        """(..., 2*num_points) point sets → (..., 4) boxes
        (reference :165 — minmax / partial_minmax / moment)."""
        shape = pts.shape[:-1]
        p = pts.reshape(shape + (self.num_points, 2))
        if y_first:
            py, px = p[..., 0], p[..., 1]
        else:
            px, py = p[..., 0], p[..., 1]
        if self.transform_method == 'minmax':
            return jnp.stack([px.min(-1), py.min(-1),
                              px.max(-1), py.max(-1)], -1)
        if self.transform_method == 'partial_minmax':
            px4, py4 = px[..., :4], py[..., :4]
            return jnp.stack([px4.min(-1), py4.min(-1),
                              px4.max(-1), py4.max(-1)], -1)
        # moment — unbiased std (torch.std N-1 denominator, reference
        # :200-201)
        mx = px.mean(-1)
        my = py.mean(-1)
        denom = max(self.num_points - 1, 1)
        sx = jnp.sqrt(jnp.clip(((px - mx[..., None]) ** 2).sum(-1)
                               / denom, 1e-12))
        sy = jnp.sqrt(jnp.clip(((py - my[..., None]) ** 2).sum(-1)
                               / denom, 1e-12))
        mt = self.moment_transfer
        mt = (mt * self.moment_mul +
              jax.lax.stop_gradient(mt) * (1 - self.moment_mul))
        half_w = sx * jnp.exp(mt[0])
        half_h = sy * jnp.exp(mt[1])
        return jnp.stack([mx - half_w, my - half_h,
                          mx + half_w, my + half_h], -1)

    # ------------------------------------------------------------ forward
    def gen_grid_from_reg(self, reg, previous_boxes):
        """Box regression (B, H, W, 4 = [dx, dy, dw, dh]) on top of
        ``previous_boxes`` → uniform kxk point grid inside the regressed
        box, y-first interleaved (B, H, W, 2K), plus the box itself
        (reference reppoints_head.py:129 gen_grid_from_reg). Units are
        feature cells throughout."""
        k = int(np.sqrt(self.num_points))
        bxy = (previous_boxes[..., :2] + previous_boxes[..., 2:]) * 0.5
        bwh = jnp.clip(previous_boxes[..., 2:] - previous_boxes[..., :2],
                       1e-6)
        topleft = (bxy + bwh * reg[..., :2]
                   - 0.5 * bwh * jnp.exp(reg[..., 2:]))
        wh = bwh * jnp.exp(reg[..., 2:])
        t = jnp.linspace(0.0, 1.0, k).astype(reg.dtype)
        # point (i, j) = (top + h*t[i], left + w*t[j]); order i*k+j
        gy = topleft[..., 1:2] + wh[..., 1:2] * t       # (..., k) rows
        gx = topleft[..., 0:1] + wh[..., 0:1] * t       # (..., k) cols
        yy = jnp.repeat(gy, k, axis=-1)                 # y0 x k, y1 x k…
        xx = jnp.tile(gx, (1,) * (gx.ndim - 1) + (k,))
        grid = jnp.stack([yy, xx], -1).reshape(
            reg.shape[:-1] + (2 * self.num_points,))
        box = jnp.concatenate(
            [topleft, topleft + wh], -1)
        return grid, box

    def forward_single(self, x, train: bool = False):
        """(reference :253). Returns (cls_out, pts_init, pts_refine),
        point offsets in feature-cell units, y-first pairs."""
        scale = self.point_base_scale / 2
        base = self.dcn_base_offset.reshape(-1)      # (2K,) y-first
        if self.use_grid_points or not self.center_init:
            points_init = jnp.asarray(
                base / np.abs(self.dcn_base_offset).max() * scale,
                self.dtype)
            bbox_init = jnp.asarray(
                [-scale, -scale, scale, scale], jnp.float32)
        else:
            points_init = 0.0  # zero-init center points
            bbox_init = None
        cls_feat = x
        pts_feat = x
        for conv in self.cls_convs:
            cls_feat = conv(cls_feat, train=train)
        for conv in self.reg_convs:
            pts_feat = conv(pts_feat, train=train)
        pts_out_init = self.reppoints_pts_init_out(
            nn.relu(self.reppoints_pts_init_conv(pts_feat)))
        if self.use_grid_points:
            pts_out_init, bbox_out_init = self.gen_grid_from_reg(
                pts_out_init.astype(jnp.float32), bbox_init)
        else:
            pts_out_init = pts_out_init + points_init

        grad_pts = (self.gradient_mul * pts_out_init +
                    (1 - self.gradient_mul)
                    * jax.lax.stop_gradient(pts_out_init))
        dcn_offset = grad_pts - jnp.asarray(base, grad_pts.dtype)

        cls_out = self.reppoints_cls_out(
            nn.relu(self.reppoints_cls_conv(cls_feat, dcn_offset)))
        pts_out_refine = self.reppoints_pts_refine_out(
            nn.relu(self.reppoints_pts_refine_conv(pts_feat, dcn_offset)))
        if self.use_grid_points:
            pts_out_refine, _ = self.gen_grid_from_reg(
                pts_out_refine.astype(jnp.float32),
                jax.lax.stop_gradient(bbox_out_init))
        else:
            pts_out_refine = pts_out_refine + \
                jax.lax.stop_gradient(pts_out_init)
        return cls_out, pts_out_init, pts_out_refine

    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        return tuple(zip(*[self.forward_single(f, train) for f in feats]))

    # -------------------------------------------------------------- points
    def get_points(self, featmap_sizes):
        """Per-level (N_l, 3) [x, y, stride] grid points."""
        return [self.point_generator.grid_points(fs, s)
                for fs, s in zip(featmap_sizes, self.point_strides)]

    def offsets_to_pts(self, pts_preds, featmap_sizes):
        """Level offsets (B, H, W, 2K y-first) → absolute xy points
        (B, N_l, K, 2) per level (reference offset_to_pts)."""
        out = []
        for lvl, pred in enumerate(pts_preds):
            stride = self.point_strides[lvl]
            pts = self.get_points(featmap_sizes)[lvl]
            b = pred.shape[0]
            o = pred.reshape(b, -1, self.num_points, 2)
            xy = jnp.stack([o[..., 1], o[..., 0]], -1)  # y-first → xy
            abs_pts = pts[None, :, None, :2] + xy * stride
            out.append(abs_pts)
        return out

    # ---------------------------------------------------------------- loss
    def _full_point_targets(self, assigner, cands, cand_extra, gt_bboxes,
                            gt_valid, gt_labels):
        """Assign on full candidate set → (labels, label_w, bbox_gt,
        bbox_w) with PseudoSampler semantics (all pos + all neg)."""
        assign = assigner.assign(cands, gt_bboxes, gt_valid, gt_labels)
        pos = assign.gt_inds > 0
        neg = assign.gt_inds == 0
        gt_idx = jnp.clip(assign.gt_inds - 1, 0)
        bbox_gt = jnp.take(gt_bboxes, gt_idx, axis=0)
        bbox_gt = jnp.where(pos[:, None], bbox_gt, 0.0)
        labels = jnp.where(pos,
                           jnp.take(gt_labels.astype(jnp.int32), gt_idx),
                           self.num_classes)
        label_w = (pos | neg).astype(jnp.float32)
        bbox_w = pos.astype(jnp.float32)
        return labels, label_w, bbox_gt, bbox_w, jnp.sum(pos)

    def loss(self, rng, cls_scores, pts_init_preds, pts_refine_preds,
             gt_bboxes, gt_valid, gt_labels, img_shapes,
             pad_shapes) -> Dict[str, jnp.ndarray]:
        featmap_sizes = tuple((s.shape[1], s.shape[2]) for s in cls_scores)
        points = self.get_points(featmap_sizes)
        all_points = jnp.concatenate(points, 0)           # (N, 3)
        b = gt_bboxes.shape[0]

        pts_init_xy = jnp.concatenate(
            self.offsets_to_pts(pts_init_preds, featmap_sizes), 1)
        pts_refine_xy = jnp.concatenate(
            self.offsets_to_pts(pts_refine_preds, featmap_sizes), 1)
        bbox_init = self.points2bbox(
            pts_init_xy.reshape(b, -1, 2 * self.num_points),
            y_first=False)
        bbox_refine = self.points2bbox(
            pts_refine_xy.reshape(b, -1, 2 * self.num_points),
            y_first=False)

        # ---- init stage: PointAssigner on grid points
        def init_tgt(gb, gv, gl):
            return self._full_point_targets(
                self._init_assigner, all_points, None, gb, gv, gl)
        (_, _, bbox_gt_i, bbox_w_i, npos_i) = jax.vmap(init_tgt)(
            gt_bboxes, gt_valid, gt_labels)

        # ---- refine stage: MaxIoUAssigner on init boxes
        def refine_tgt(boxes, gb, gv, gl):
            return self._full_point_targets(
                self._refine_assigner, boxes, None, gb, gv, gl)
        (labels_r, label_w_r, bbox_gt_r, bbox_w_r, npos_r) = jax.vmap(
            refine_tgt)(jax.lax.stop_gradient(bbox_init), gt_bboxes,
                        gt_valid, gt_labels)

        # normalize terms: per-point stride (reference :610-660)
        strides = jnp.concatenate([
            jnp.full((p.shape[0],), s, jnp.float32)
            for p, s in zip(points, self.point_strides)])
        norm = (self.point_base_scale * strides)[None, :, None]

        cls_flat = jnp.concatenate([
            s.reshape(b, -1, self.cls_out_channels) for s in cls_scores],
            axis=1)
        num_pos_r = jnp.maximum(jnp.sum(npos_r).astype(jnp.float32), 1.0)
        loss_cls = self._loss_cls(
            cls_flat.reshape(-1, self.cls_out_channels),
            labels_r.reshape(-1),
            weight=label_w_r.reshape(-1), avg_factor=num_pos_r)

        num_pos_i = jnp.maximum(jnp.sum(npos_i).astype(jnp.float32), 1.0)
        loss_pts_init = self._loss_bbox_init(
            bbox_init / norm, bbox_gt_i / norm,
            weight=jnp.broadcast_to(bbox_w_i[..., None],
                                    bbox_init.shape),
            avg_factor=num_pos_i)
        loss_pts_refine = self._loss_bbox_refine(
            bbox_refine / norm, bbox_gt_r / norm,
            weight=jnp.broadcast_to(bbox_w_r[..., None],
                                    bbox_refine.shape),
            avg_factor=num_pos_r)
        return dict(loss_cls=loss_cls, loss_pts_init=loss_pts_init,
                    loss_pts_refine=loss_pts_refine)

    # --------------------------------------------------------------- boxes
    def get_bboxes(self, cls_scores, pts_init_preds, pts_refine_preds,
                   img_shapes, scale_factors, cfg=None,
                   rescale: bool = True, with_nms: bool = True):
        cfg = dict(cfg or self.test_cfg)
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        points = self.get_points(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)
        b = cls_scores[0].shape[0]

        bbox_preds = []
        for lvl, pred in enumerate(pts_refine_preds):
            o = pred.reshape(b, -1, 2 * self.num_points)
            bbox = self.points2bbox(o, y_first=True)
            bbox = bbox * self.point_strides[lvl] \
                + jnp.concatenate([points[lvl][:, :2]] * 2,
                                  -1)[None]
            bbox_preds.append(bbox)

        def per_image(scores_lvls, boxes_lvls, img_shape, scale_factor):
            mlvl_boxes, mlvl_scores = [], []
            for s, bx in zip(scores_lvls, boxes_lvls):
                sc = jax.nn.sigmoid(
                    s.reshape(-1, self.cls_out_channels)
                    .astype(jnp.float32))
                bx = bx.reshape(-1, 4)
                if 0 < nms_pre < sc.shape[0]:
                    _, topk = jax.lax.top_k(sc.max(-1), nms_pre)
                    sc, bx = sc[topk], bx[topk]
                h, w = img_shape[0], img_shape[1]
                bx = jnp.stack([jnp.clip(bx[:, 0], 0, w),
                                jnp.clip(bx[:, 1], 0, h),
                                jnp.clip(bx[:, 2], 0, w),
                                jnp.clip(bx[:, 3], 0, h)], -1)
                mlvl_boxes.append(bx)
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
            bbox_preds, img_shapes, scale_factors)
