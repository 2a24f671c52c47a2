"""FoveaHead (reference: mmdet/models/dense_heads/fovea_head.py:43;
FoveaBox arXiv:1904.03797) — anchor-free per-pixel log-space box
regression against per-level base edges, positives painted inside the
σ-shrunk "fovea" of each scale-matched gt.

TPU-native: the reference paints gts per level sorted by DESCENDING
area so the smallest overlapping gt wins each cell — here that is an
argmin over per-cell masked gt areas (same winner, no sort)."""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS, build_loss
from ..layers import ConvModule, bias_prob_init, normal_init
from ...core.nms import fast_topk, multiclass_nms

INF = 1e8


@HEADS.register_module()
class FoveaHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    base_edge_list: Sequence[int] = (16, 32, 64, 128, 256)
    scale_ranges: Sequence[Tuple[int, int]] = (
        (8, 32), (16, 64), (32, 128), (64, 256), (128, 512))
    sigma: float = 0.4
    with_deform: bool = False
    deform_groups: int = 4
    norm_cfg: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        self._loss_cls = build_loss(dict(
            self.loss_cls or dict(type='FocalLoss', use_sigmoid=True,
                                  gamma=1.5, alpha=0.4,
                                  loss_weight=1.0)))
        self._loss_bbox = build_loss(dict(
            self.loss_bbox or dict(type='SmoothL1Loss', beta=0.11,
                                   loss_weight=1.0)))
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
        self.conv_cls = nn.Conv(self.num_classes, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                kernel_init=normal_init(0.01),
                                bias_init=bias_prob_init(0.01),
                                name='conv_cls')
        self.conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2,
                                dtype=self.dtype,
                                kernel_init=normal_init(0.01),
                                name='conv_reg')

    def forward_single(self, x, train: bool = False):
        cls_feat = x
        reg_feat = x
        for conv in self.reg_convs:
            reg_feat = conv(reg_feat, train=train)
        bbox_pred = self.conv_reg(reg_feat)
        for conv in self.cls_convs:
            cls_feat = conv(cls_feat, train=train)
        cls_score = self.conv_cls(cls_feat)
        return cls_score, bbox_pred

    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        return tuple(zip(*[self.forward_single(f, train) for f in feats]))

    # ----------------------------------------------------------- targets
    def _target_level(self, featmap_size, stride, base_len, bounds,
                      gt_bboxes, gt_valid, gt_labels):
        """One level, one image: labels (H*W,), bbox targets (H*W, 4)
        (reference :204 _get_target_single)."""
        h, w = featmap_size
        lower, upper = bounds
        areas = jnp.sqrt(jnp.maximum(
            (gt_bboxes[:, 2] - gt_bboxes[:, 0]) *
            (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 0.0))
        hit = (areas >= lower) & (areas <= upper) & gt_valid

        fb = gt_bboxes / stride
        half_w = 0.5 * (fb[:, 2] - fb[:, 0])
        half_h = 0.5 * (fb[:, 3] - fb[:, 1])
        px1 = jnp.clip(jnp.ceil(fb[:, 0] + (1 - self.sigma) * half_w
                                - 0.5), 0, w - 1)
        px2 = jnp.clip(jnp.floor(fb[:, 0] + (1 + self.sigma) * half_w
                                 - 0.5), 0, w - 1)
        py1 = jnp.clip(jnp.ceil(fb[:, 1] + (1 - self.sigma) * half_h
                                - 0.5), 0, h - 1)
        py2 = jnp.clip(jnp.floor(fb[:, 1] + (1 + self.sigma) * half_h
                                 - 0.5), 0, h - 1)

        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)
        in_y = ((ys[None] >= py1[:, None]) &
                (ys[None] <= py2[:, None]))                 # (G, H)
        in_x = ((xs[None] >= px1[:, None]) &
                (xs[None] <= px2[:, None]))                 # (G, W)
        cover = (in_y[:, :, None] & in_x[:, None, :] &
                 hit[:, None, None])                        # (G, H, W)
        # smallest-area covering gt wins (reference paints descending)
        amat = jnp.where(cover, areas[:, None, None], INF)
        win = jnp.argmin(amat, axis=0)                      # (H, W)
        pos = jnp.min(amat, axis=0) < INF
        labels = jnp.where(pos,
                           jnp.take(gt_labels.astype(jnp.int32), win),
                           self.num_classes)

        gx = (xs[None, :] + 0.5) * stride                   # (1, W)
        gy = (ys[:, None] + 0.5) * stride                   # (H, 1)
        gt_win = jnp.take(gt_bboxes, win.reshape(-1),
                          axis=0).reshape(h, w, 4)
        t = jnp.stack([
            (gx * jnp.ones((h, 1)) - gt_win[..., 0]) / base_len,
            (gy * jnp.ones((1, w)) - gt_win[..., 1]) / base_len,
            (gt_win[..., 2] - gx * jnp.ones((h, 1))) / base_len,
            (gt_win[..., 3] - gy * jnp.ones((1, w))) / base_len], -1)
        t = jnp.where(pos[..., None], t, 1.0)
        t = jnp.log(jnp.clip(t, 1.0 / 16, 16.0))
        return labels.reshape(-1), t.reshape(-1, 4), pos.reshape(-1)

    # -------------------------------------------------------------- loss
    def loss(self, rng, cls_scores, bbox_preds, gt_bboxes, gt_valid,
             gt_labels, img_shapes, pad_shapes) -> Dict[str, jnp.ndarray]:
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        b = gt_bboxes.shape[0]
        lab_l, tgt_l, pos_l = [], [], []
        for fs, stride, base, bounds in zip(
                featmap_sizes, self.strides, self.base_edge_list,
                self.scale_ranges):
            lab, tgt, pos = jax.vmap(
                lambda gb, gv, gl: self._target_level(
                    fs, stride, base, bounds, gb, gv, gl))(
                gt_bboxes, gt_valid, gt_labels)
            lab_l.append(lab)
            tgt_l.append(tgt)
            pos_l.append(pos)
        labels = jnp.concatenate(lab_l, 1)                  # (B, N)
        targets = jnp.concatenate(tgt_l, 1)
        pos = jnp.concatenate(pos_l, 1)
        num_pos = jnp.sum(pos)

        cls_flat = jnp.concatenate([
            s.astype(jnp.float32).reshape(b, -1, self.num_classes)
            for s in cls_scores], 1)
        box_flat = jnp.concatenate([
            p.astype(jnp.float32).reshape(b, -1, 4)
            for p in bbox_preds], 1)
        loss_cls = self._loss_cls(cls_flat, labels,
                                  avg_factor=num_pos + b)
        loss_bbox = self._loss_bbox(
            box_flat, targets,
            weight=jnp.broadcast_to(pos[..., None].astype(jnp.float32),
                                    targets.shape),
            avg_factor=jnp.maximum(num_pos, 1))
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    # ------------------------------------------------------------- boxes
    def get_bboxes(self, cls_scores, bbox_preds, img_shapes,
                   scale_factors, cfg=None, rescale: bool = True,
                   with_nms: bool = True):
        cfg = dict(cfg or self.test_cfg)
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        nms_pre = cfg.get('nms_pre', -1)
        b = cls_scores[0].shape[0]
        # (idx + 0.5) cell-coordinate points per level
        pts = []
        for (h, w) in featmap_sizes:
            yy, xx = np.meshgrid(np.arange(h), np.arange(w),
                                 indexing='ij')
            pts.append(jnp.asarray(
                np.stack([xx.ravel() + 0.5, yy.ravel() + 0.5], -1),
                jnp.float32))

        def per_image(scores_lvls, preds_lvls, img_shape, scale_factor):
            mlvl_boxes, mlvl_scores = [], []
            for p, sc, bp, stride, base in zip(
                    pts, scores_lvls, preds_lvls, self.strides,
                    self.base_edge_list):
                sc = jax.nn.sigmoid(
                    sc.reshape(-1, self.num_classes).astype(jnp.float32))
                bp = jnp.exp(bp.reshape(-1, 4).astype(jnp.float32))
                pp = p
                if 0 < nms_pre < sc.shape[0]:
                    _, topk = fast_topk(sc.max(-1), nms_pre)
                    sc, bp, pp = sc[topk], bp[topk], p[topk]
                hmax = img_shape[0].astype(jnp.float32) - 1
                wmax = img_shape[1].astype(jnp.float32) - 1
                x1 = jnp.clip(stride * pp[:, 0] - base * bp[:, 0],
                              0, wmax)
                y1 = jnp.clip(stride * pp[:, 1] - base * bp[:, 1],
                              0, hmax)
                x2 = jnp.clip(stride * pp[:, 0] + base * bp[:, 2],
                              0, wmax)
                y2 = jnp.clip(stride * pp[:, 1] + base * bp[:, 3],
                              0, hmax)
                mlvl_boxes.append(jnp.stack([x1, y1, x2, y2], -1))
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
            [s.reshape(b, -1, self.num_classes) for s in cls_scores],
            [p.reshape(b, -1, 4) for p in bbox_preds],
            img_shapes, scale_factors)
