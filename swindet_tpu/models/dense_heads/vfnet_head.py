"""VFNetHead — VarifocalNet (reference: mmdet/models/dense_heads/
vfnet_head.py:19, arXiv:2008.13367): FCOS-style towers, an initial
(l, t, r, b) regression, star-shaped deformable refinement of both the
regression and the IoU-aware classification branch, varifocal loss.

Static-shape port: ATSS assignment on the square anchor set by
default (use_atss=True, matching the reference's default), or FCOS
area-based point assignment (use_atss=False); the star DCN offsets are
built in NHWC (dy, dx) pairs for ops/deform_conv.DeformConv2d, which
adds the base kernel grid itself — so the base is subtracted here
exactly as the reference does for mmcv's DCN.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import (HEADS, build_anchor_generator, build_assigner,
                       build_loss)
from ..layers import ConvModule, bias_prob_init, normal_init
from ...core.anchors import PointGenerator, anchor_inside_flags
from ...core.bbox.coders import bbox2distance, distance2bbox
from ...core.bbox.iou import bbox_overlaps
from ...ops.deform_conv import DeformConv2d
from .fcos_head import FCOSHead, INF


# star kernel: (dy, dx) multipliers of (-y1, -x1, x2, y2) per of the 9
# kernel points (reference star_dcn_offset :275-316)
def _star_offsets(l, t, r, b):
    """l,t,r,b: (..., H, W) normalized distances → (..., H, W, 18)."""
    z = jnp.zeros_like(l)
    pairs = [(-t, -l), (-t, z), (-t, r),
             (z, -l), (z, z), (z, r),
             (b, -l), (b, z), (b, r)]
    out = []
    for dy, dx in pairs:
        out += [dy, dx]
    return jnp.stack(out, axis=-1)


_DCN_BASE = np.stack(np.meshgrid(np.arange(3) - 1, np.arange(3) - 1,
                                 indexing='ij'), -1).reshape(-1)  # (18,)


@HEADS.register_module()
class VFNetHead(FCOSHead):
    gradient_mul: float = 0.1
    bbox_norm_type: str = 'reg_denom'
    use_vfl: bool = True
    use_atss: bool = True
    sync_num_pos: bool = True   # pos-count sync comes from the engine's
                                # mesh loss averaging; accepted for
                                # config parity
    anchor_generator: Optional[dict] = None
    dcn_on_last_conv: bool = False
    loss_bbox_refine: Optional[dict] = None

    def setup(self):
        self.point_generator = PointGenerator()
        if self.use_atss:
            # square-anchor generator used ONLY for ATSS target
            # assignment (reference vfnet_head.py:92-137); its
            # center_offset also shifts the head's points
            ag = dict(self.anchor_generator or dict(
                type='AnchorGenerator', ratios=[1.0],
                octave_base_scale=8, scales_per_octave=1,
                center_offset=0.0, strides=list(self.strides)))
            self.anchor_center_offset = ag.get('center_offset', 0.0)
            self.atss_prior_generator = build_anchor_generator(ag)
            if self.train_cfg:
                self._atss_assigner = build_assigner(
                    dict(dict(self.train_cfg)['assigner']))
        self._loss_cls = build_loss(dict(
            self.loss_cls or dict(type='VarifocalLoss', use_sigmoid=True,
                                  alpha=0.75, gamma=2.0,
                                  iou_weighted=True, loss_weight=1.0)))
        self._loss_bbox = build_loss(dict(
            self.loss_bbox or dict(type='GIoULoss', loss_weight=1.5)))
        self._loss_bbox_refine = build_loss(dict(
            self.loss_bbox_refine or dict(type='GIoULoss',
                                          loss_weight=2.0)))
        self.cls_convs = [
            ConvModule(self.feat_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg or dict(type='GN',
                                                      num_groups=32),
                       act_cfg=dict(type='ReLU'), dtype=self.dtype,
                       name=f'cls_convs{i}')
            for i in range(self.stacked_convs)]
        self.reg_convs = [
            ConvModule(self.feat_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg or dict(type='GN',
                                                      num_groups=32),
                       act_cfg=dict(type='ReLU'), dtype=self.dtype,
                       name=f'reg_convs{i}')
            for i in range(self.stacked_convs)]
        self.vfnet_reg_conv = ConvModule(
            self.feat_channels, 3, padding=1,
            norm_cfg=self.norm_cfg or dict(type='GN', num_groups=32),
            act_cfg=dict(type='ReLU'), dtype=self.dtype,
            name='vfnet_reg_conv')
        self.vfnet_reg = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2,
                                 dtype=self.dtype,
                                 kernel_init=normal_init(0.01),
                                 name='vfnet_reg')
        self.vfnet_reg_refine_dconv = DeformConv2d(
            self.feat_channels, (3, 3), dtype=self.dtype,
            name='vfnet_reg_refine_dconv')
        self.vfnet_reg_refine = nn.Conv(4, (3, 3),
                                        padding=[(1, 1)] * 2,
                                        dtype=self.dtype,
                                        kernel_init=normal_init(0.01),
                                        name='vfnet_reg_refine')
        self.vfnet_cls_dconv = DeformConv2d(
            self.feat_channels, (3, 3), dtype=self.dtype,
            name='vfnet_cls_dconv')
        self.vfnet_cls = nn.Conv(self.num_classes, (3, 3),
                                 padding=[(1, 1)] * 2, dtype=self.dtype,
                                 kernel_init=normal_init(0.01),
                                 bias_init=bias_prob_init(0.01),
                                 name='vfnet_cls')
        self.scales = self.param('scales', nn.initializers.ones,
                                 (len(self.strides),))
        self.scales_refine = self.param('scales_refine',
                                        nn.initializers.ones,
                                        (len(self.strides),))

    def _get_points(self, featmap_sizes):
        """ATSS mode places points at the anchor centers
        (grid + stride * center_offset, reference vfnet_head.py:613);
        FCOS mode keeps the stride//2 cell centers."""
        if not self.use_atss:
            return super()._get_points(featmap_sizes)
        pts = []
        for fs, s in zip(featmap_sizes, self.strides):
            p = self.point_generator.grid_points(fs, s)
            off = s * self.anchor_center_offset
            pts.append(jnp.stack([p[:, 0] + off, p[:, 1] + off], -1))
        return pts

    def _atss_vfnet_target_single(self, featmap_sizes, all_pts,
                                  flat_anchors, num_level_anchors,
                                  gt_bboxes, gt_valid, gt_labels,
                                  img_shape, pad_shape):
        """ATSS assignment on the square anchors; targets are the raw
        assigned gt boxes converted to (l, t, r, b) point distances
        (reference vfnet_head.py get_atss_targets:710 +
        transform_bbox_targets:765; atss _get_target_single returns
        pos_gt_bboxes because VFNetHead carries no bbox_coder)."""
        cfg = dict(self.train_cfg)
        valid_flags = jnp.concatenate(
            self.atss_prior_generator.valid_flags(featmap_sizes,
                                                  pad_shape), 0)
        inside = anchor_inside_flags(flat_anchors, valid_flags,
                                     img_shape,
                                     cfg.get('allowed_border', -1))
        assign = self._atss_assigner.assign(
            flat_anchors, num_level_anchors, gt_bboxes, gt_valid,
            gt_labels, bbox_valid=inside)
        pos = assign.gt_inds > 0
        labels = jnp.where(pos, jnp.clip(assign.labels, 0),
                           self.num_classes)
        g = gt_bboxes.shape[0]
        gt_idx = jnp.clip(assign.gt_inds - 1, 0, g - 1)
        pos_gt = jnp.take(gt_bboxes, gt_idx, axis=0)
        ltrb = bbox2distance(all_pts, pos_gt)
        bbox_t = jnp.where(pos[:, None], ltrb, 0.0)
        return labels, bbox_t, pos

    def forward_single(self, x, lvl: int, train: bool = False):
        stride = self.strides[lvl]
        reg_denom = (self.regress_ranges[lvl][1]
                     if self.bbox_norm_type == 'reg_denom'
                     and self.regress_ranges[lvl][1] != INF
                     else stride * 8 if self.bbox_norm_type == 'reg_denom'
                     else stride)
        cls_feat = x
        reg_feat = x
        for conv in self.cls_convs:
            cls_feat = conv(cls_feat, train=train)
        for conv in self.reg_convs:
            reg_feat = conv(reg_feat, train=train)

        reg_init = self.vfnet_reg_conv(reg_feat, train=train)
        bbox_pred = jnp.exp(
            (self.vfnet_reg(reg_init).astype(jnp.float32)
             * self.scales[lvl])) * reg_denom

        # star offsets (gradient-attenuated, feature scale)
        bp = ((1 - self.gradient_mul) * jax.lax.stop_gradient(bbox_pred)
              + self.gradient_mul * bbox_pred) / stride
        l_, t_, r_, b_ = (bp[..., 0], bp[..., 1], bp[..., 2],
                          bp[..., 3])
        offset = _star_offsets(l_, t_, r_, b_) - \
            jnp.asarray(_DCN_BASE, jnp.float32)

        reg_ref = nn.relu(self.vfnet_reg_refine_dconv(
            reg_feat, offset.astype(reg_feat.dtype)))
        refine = jnp.exp(
            (self.vfnet_reg_refine(reg_ref).astype(jnp.float32)
             * self.scales_refine[lvl]))
        bbox_pred_refine = refine * jax.lax.stop_gradient(bbox_pred)

        cls_feat = nn.relu(self.vfnet_cls_dconv(
            cls_feat, offset.astype(cls_feat.dtype)))
        cls_score = self.vfnet_cls(cls_feat)
        return cls_score, bbox_pred, bbox_pred_refine

    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        outs = [self.forward_single(f, i, train)
                for i, f in enumerate(feats)]
        return tuple(zip(*outs))

    # ---------------------------------------------------------------- loss
    def loss(self, rng, cls_scores, bbox_preds, bbox_preds_refine,
             gt_bboxes, gt_valid, gt_labels, img_shapes,
             pad_shapes) -> Dict[str, jnp.ndarray]:
        """(reference: vfnet_head.py loss:320 — FCOS-style targets,
        IoU-weighted bbox losses, varifocal cls with IoU targets)."""
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

        if self.use_atss:
            anchor_list = self.atss_prior_generator.grid_anchors(
                featmap_sizes)
            num_level_anchors = [int(a.shape[0]) for a in anchor_list]
            flat_anchors = jnp.concatenate(anchor_list, 0)
            labels, bbox_t, pos = jax.vmap(
                lambda gb, gv, gl, sh, ps:
                self._atss_vfnet_target_single(
                    featmap_sizes, all_pts, flat_anchors,
                    num_level_anchors, gb, gv, gl, sh, ps))(
                        gt_bboxes, gt_valid, gt_labels, img_shapes,
                        pad_shapes)
        else:
            labels, bbox_t, pos = jax.vmap(
                lambda gb, gv, gl: self._target_single(
                    all_pts, strides_pts, ranges, gb, gv, gl))(
                        gt_bboxes, gt_valid, gt_labels)

        C = self.num_classes
        cls_flat = jnp.concatenate(
            [s.reshape(b, -1, C) for s in cls_scores], 1)
        ini_flat = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in bbox_preds], 1)
        ref_flat = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in bbox_preds_refine], 1)

        pts_b = jnp.broadcast_to(all_pts[None], (b,) + all_pts.shape)
        dec_ini = distance2bbox(pts_b, ini_flat)
        dec_ref = distance2bbox(pts_b, ref_flat)
        dec_t = distance2bbox(pts_b, bbox_t)

        num_pos = jnp.maximum(jnp.sum(pos).astype(jnp.float32), 1.0)
        iou_ini = jnp.where(pos, bbox_overlaps(
            jax.lax.stop_gradient(dec_ini), dec_t, is_aligned=True), 0.0)
        w_ini = iou_ini / jnp.maximum(jnp.sum(iou_ini) / num_pos, 1e-6)
        loss_bbox = self._loss_bbox(
            dec_ini.reshape(-1, 4), dec_t.reshape(-1, 4),
            weight=jnp.where(pos, w_ini, 0.0).reshape(-1),
            avg_factor=jnp.maximum(jnp.sum(w_ini * pos), 1e-6))

        iou_ref = jnp.where(pos, bbox_overlaps(
            jax.lax.stop_gradient(dec_ref), dec_t, is_aligned=True), 0.0)
        w_ref = iou_ref / jnp.maximum(jnp.sum(iou_ref) / num_pos, 1e-6)
        loss_bbox_rf = self._loss_bbox_refine(
            dec_ref.reshape(-1, 4), dec_t.reshape(-1, 4),
            weight=jnp.where(pos, w_ref, 0.0).reshape(-1),
            avg_factor=jnp.maximum(jnp.sum(w_ref * pos), 1e-6))

        # varifocal targets: refined IoU at the gt class (reference :137)
        safe = jnp.clip(labels, 0, C - 1)
        vfl_t = jnp.where(
            jax.nn.one_hot(safe, C, dtype=bool) & pos[..., None],
            iou_ref[..., None], 0.0)
        loss_cls = self._loss_cls(
            cls_flat.reshape(-1, C), vfl_t.reshape(-1, C),
            avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_bbox_rf=loss_bbox_rf)

    # --------------------------------------------------------------- boxes
    def get_bboxes(self, cls_scores, bbox_preds, bbox_preds_refine,
                   img_shapes, scale_factors, cfg=None,
                   rescale: bool = True, with_nms: bool = True):
        """Refined boxes + sigmoid scores, no centerness (reference:
        vfnet_head.py get_bboxes:472)."""
        from ...core.nms import multiclass_nms, fast_topk
        cfg = dict(cfg or self.test_cfg)
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        pts = self._get_points(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)
        b = cls_scores[0].shape[0]

        def per_image(scores_lvls, preds_lvls, img_shape, scale_factor):
            mlvl_boxes, mlvl_scores = [], []
            for p, (sc, bp) in zip(pts, zip(scores_lvls, preds_lvls)):
                sc = jax.nn.sigmoid(
                    sc.reshape(-1, self.num_classes).astype(jnp.float32))
                bp = bp.reshape(-1, 4)
                if 0 < nms_pre < sc.shape[0]:
                    _, topk = fast_topk(sc.max(-1), nms_pre)
                    sc, bp, pp = sc[topk], bp[topk], p[topk]
                else:
                    pp = p
                boxes = distance2bbox(pp, bp, max_shape=img_shape)
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
            [s.reshape(b, -1, self.num_classes) for s in cls_scores],
            [p.reshape(b, -1, 4) for p in bbox_preds_refine],
            img_shapes, scale_factors)
