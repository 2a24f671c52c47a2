"""GuidedAnchor heads — GA-RPN / GA-RetinaNet (reference:
mmdet/models/dense_heads/guided_anchor_head.py:57,
ga_rpn_head.py:17, ga_retina_head.py:11; arXiv:1901.03278).

TPU-native re-design notes:
- MaskedConv2d is a dense conv + output mask (ops/masked_conv.py) — the
  loc filter becomes a validity mask on the fixed-shape candidate set
  instead of a dynamic gather (masked positions' scores are -inf so
  top-k/NMS exclude them exactly like the reference's subset).
- Guided anchors are decoded for EVERY location (batched coder decode);
  the reference's `squares[mask]` subset is reproduced by the same
  validity mask.
- ga_loc_targets' per-gt region painting loop becomes a broadcast
  (G, H, W) region-membership reduction.
- The loc branch's focal targets (1 = center) are passed through
  exactly as the reference does (guided_anchor_head.py:633
  loss_loc_single) — including the v2.x label-convention quirk where
  label 1 on a 1-channel sigmoid focal head lands on the background
  side (verified against the reference's own py_sigmoid path).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import (HEADS, build_anchor_generator, build_assigner,
                       build_bbox_coder, build_loss, build_sampler)
from ..layers import ConvModule, bias_prob_init, normal_init
from ...core.anchors import anchor_inside_flags
from ...core.bbox.assigners import calc_region
from ...core.nms import batched_nms, fast_topk, multiclass_nms
from ...ops.deform_conv import DeformConv2d
from ...ops.masked_conv import MaskedConv2d
from .anchor_head import AnchorHead


class FeatureAdaption(nn.Module):
    """DCN-v1 offsets predicted from the anchor-shape branch
    (reference: guided_anchor_head.py:15)."""
    out_channels: int
    kernel_size: int = 3
    deform_groups: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, shape_pred):
        k2 = self.kernel_size * self.kernel_size
        offset = nn.Conv(self.deform_groups * k2 * 2, (1, 1),
                         use_bias=False, dtype=self.dtype,
                         kernel_init=normal_init(0.1),
                         name='conv_offset')(
            jax.lax.stop_gradient(shape_pred))
        x = DeformConv2d(self.out_channels,
                         (self.kernel_size, self.kernel_size),
                         deform_groups=self.deform_groups,
                         dtype=self.dtype, kernel_init=normal_init(0.01),
                         name='conv_adaption')(x, offset)
        return nn.relu(x)


@HEADS.register_module()
class GuidedAnchorHead(AnchorHead):
    """Square anchors + predicted (loc, shape) → guided anchors."""
    approx_anchor_generator: Optional[dict] = None
    square_anchor_generator: Optional[dict] = None
    anchor_coder: Optional[dict] = None
    loc_filter_thr: float = 0.01
    deform_groups: int = 4
    loss_loc: Optional[dict] = None
    loss_shape: Optional[dict] = None

    def setup(self):
        self.approx_gen = build_anchor_generator(dict(
            self.approx_anchor_generator or dict(
                type='AnchorGenerator', octave_base_scale=8,
                scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                strides=[4, 8, 16, 32, 64])))
        self.square_gen = build_anchor_generator(dict(
            self.square_anchor_generator or dict(
                type='AnchorGenerator', ratios=[1.0], scales=[8],
                strides=[4, 8, 16, 32, 64])))
        self.approxs_per_octave = self.approx_gen.num_base_anchors[0]
        self.prior_generator = self.square_gen
        self.num_base_priors = 1

        cfg_cls = self.loss_cls or dict(type='CrossEntropyLoss',
                                        use_sigmoid=True, loss_weight=1.0)
        self.use_sigmoid_cls = cfg_cls.get('use_sigmoid', False)
        self.cls_out_channels = (self.num_classes if self.use_sigmoid_cls
                                 else self.num_classes + 1)
        self._loss_cls = build_loss(dict(cfg_cls))
        self._loss_bbox = build_loss(dict(
            self.loss_bbox or dict(type='SmoothL1Loss', beta=1.0,
                                   loss_weight=1.0)))
        self._loss_loc = build_loss(dict(
            self.loss_loc or dict(type='FocalLoss', use_sigmoid=True,
                                  gamma=2.0, alpha=0.25, loss_weight=1.0)))
        self._loss_shape = build_loss(dict(
            self.loss_shape or dict(type='BoundedIoULoss', beta=0.2,
                                    loss_weight=1.0)))
        self._ghm_cls_acc = None
        self._ghm_bbox_acc = None
        self._anchor_coder = build_bbox_coder(dict(
            self.anchor_coder or dict(type='DeltaXYWHBBoxCoder',
                                      target_means=[0., 0., 0., 0.],
                                      target_stds=[1., 1., 1., 1.])))
        self._bbox_coder = build_bbox_coder(dict(
            self.bbox_coder or dict(type='DeltaXYWHBBoxCoder',
                                    target_means=[0., 0., 0., 0.],
                                    target_stds=[1., 1., 1., 1.])))
        if self.train_cfg:
            self._assigner = build_assigner(dict(self.train_cfg['assigner']))
            self._sampler = build_sampler(dict(
                self.train_cfg.get('sampler', dict(type='PseudoSampler'))))
            self._ga_assigner = build_assigner(dict(
                self.train_cfg['ga_assigner']))
            self.ga_sampling = 'ga_sampler' in dict(self.train_cfg)
            self._ga_sampler = build_sampler(dict(
                self.train_cfg.get('ga_sampler',
                                   dict(type='PseudoSampler'))))
        self._init_layers()

    def _init_layers(self):
        self.conv_loc = nn.Conv(1, (1, 1), dtype=self.dtype,
                                kernel_init=normal_init(0.01),
                                bias_init=bias_prob_init(0.01),
                                name='conv_loc')
        self.conv_shape = nn.Conv(2, (1, 1), dtype=self.dtype,
                                  kernel_init=normal_init(0.01),
                                  name='conv_shape')
        self.feature_adaption = FeatureAdaption(
            self.feat_channels, deform_groups=self.deform_groups,
            dtype=self.dtype, name='feature_adaption')
        self.conv_cls = MaskedConv2d(self.cls_out_channels, 1,
                                     dtype=self.dtype,
                                     kernel_init=normal_init(0.01),
                                     name='conv_cls')
        self.conv_reg = MaskedConv2d(4, 1, dtype=self.dtype,
                                     kernel_init=normal_init(0.01),
                                     name='conv_reg')

    def forward_single(self, x, train: bool = False):
        loc_pred = self.conv_loc(x)
        shape_pred = self.conv_shape(x)
        x = self.feature_adaption(x, shape_pred)
        mask = (None if train else
                jax.nn.sigmoid(loc_pred.astype(jnp.float32))
                >= self.loc_filter_thr)
        cls_score = self.conv_cls(x, mask)
        bbox_pred = self.conv_reg(x, mask)
        return cls_score, bbox_pred, shape_pred, loc_pred

    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        return tuple(zip(*[self.forward_single(f, train) for f in feats]))

    # -------------------------------------------------- guided anchors
    def guided_anchors(self, featmap_sizes, shape_preds, loc_preds,
                       use_loc_filter: bool):
        """Per level: guided anchors (B, N, 4) + loc mask (B, N)
        (reference: _get_guided_anchors_single :342)."""
        squares = self.square_gen.grid_anchors(featmap_sizes)
        out_anchors, out_masks = [], []
        for lvl, sq in enumerate(squares):
            b = shape_preds[lvl].shape[0]
            deltas = jax.lax.stop_gradient(
                shape_preds[lvl].astype(jnp.float32)).reshape(b, -1, 2)
            full = jnp.concatenate(
                [jnp.zeros_like(deltas), deltas], -1)       # (B, N, 4)
            ga = self._anchor_coder.decode(
                jnp.broadcast_to(sq[None], (b,) + sq.shape), full,
                wh_ratio_clip=1e-6)
            loc = jax.lax.stop_gradient(
                jax.nn.sigmoid(loc_preds[lvl].astype(jnp.float32)))
            loc = loc.reshape(b, -1)
            mask = (loc >= self.loc_filter_thr if use_loc_filter
                    else loc >= 0.0)
            out_anchors.append(ga)
            out_masks.append(mask)
        return out_anchors, out_masks

    # ----------------------------------------------------- loc targets
    def ga_loc_targets(self, gt_bboxes, gt_valid, featmap_sizes):
        """(reference :376) center regions → 1/weight 1; ignore ring and
        adjacent-level rings → weight 0; elsewhere → 0/weight 0.1."""
        strides = [s[0] for s in self.approx_gen.strides]
        scale = self.approx_gen.octave_base_scale
        cr = self.train_cfg['center_ratio']
        ir = self.train_cfg['ignore_ratio']
        r1 = (1 - cr) / 2
        r2 = (1 - ir) / 2
        num_lvls = len(featmap_sizes)
        b, g = gt_bboxes.shape[:2]

        gscale = jnp.sqrt(jnp.maximum(
            (gt_bboxes[..., 2] - gt_bboxes[..., 0]) *
            (gt_bboxes[..., 3] - gt_bboxes[..., 1]), 1e-6))
        min_sz = float(scale * strides[0])
        tl = jnp.clip(jnp.floor(jnp.log2(gscale / min_sz) + 0.5),
                      0, num_lvls - 1).astype(jnp.int32)     # (B, G)

        def paint(region, h, w, active):
            """(B,G,4 region) & active (B,G) → (B,H,W) any-gt mask."""
            x1, y1, x2, y2 = region
            ys = jnp.arange(h, dtype=jnp.float32)
            xs = jnp.arange(w, dtype=jnp.float32)
            in_y = ((ys[None, None] >= y1[..., None]) &
                    (ys[None, None] <= y2[..., None]))       # (B,G,H)
            in_x = ((xs[None, None] >= x1[..., None]) &
                    (xs[None, None] <= x2[..., None]))       # (B,G,W)
            m = (in_y[..., :, None] & in_x[..., None, :] &
                 active[..., None, None])
            return jnp.any(m, axis=1)                        # (B,H,W)

        def region_masks(region, h, w, active):
            """(B,G,4 region) & active (B,G) → (B,G,H,W) per-gt masks."""
            x1, y1, x2, y2 = region
            ys = jnp.arange(h, dtype=jnp.float32)
            xs = jnp.arange(w, dtype=jnp.float32)
            in_y = ((ys[None, None] >= y1[..., None]) &
                    (ys[None, None] <= y2[..., None]))
            in_x = ((xs[None, None] >= x1[..., None]) &
                    (xs[None, None] <= x2[..., None]))
            return (in_y[..., :, None] & in_x[..., None, :] &
                    active[..., None, None])

        loc_targets, loc_weights = [], []
        total_cells = 0
        for lvl in range(num_lvls):
            h, w = featmap_sizes[lvl]
            stride = strides[lvl]
            at = (tl == lvl) & gt_valid
            ctr_g = region_masks(calc_region(gt_bboxes, r1, stride,
                                             (h, w)), h, w, at)
            ign_g = region_masks(calc_region(gt_bboxes, r2, stride,
                                             (h, w)), h, w, at)
            ctr = jnp.any(ctr_g, axis=1)
            adj = ((tl == lvl - 1) | (tl == lvl + 1)) & gt_valid
            ign_adj = paint(calc_region(gt_bboxes, r2, stride, (h, w)),
                            h, w, adj)
            # reference paints per-gt IN ORDER: ignore=0 then center=1
            # (:437-446) — a later gt's ignore ring can zero an earlier
            # gt's center. Sentinel -1 = untouched; scan reproduces the
            # order exactly.
            def step(wcur, masks):
                ig, ct = masks
                wcur = jnp.where(ig, 0.0, wcur)
                return jnp.where(ct, 1.0, wcur), None

            w0 = jnp.full((b, h, w), -1.0, jnp.float32)
            wgt, _ = jax.lax.scan(
                step, w0, (jnp.swapaxes(ign_g, 0, 1),
                           jnp.swapaxes(ctr_g, 0, 1)))
            # adjacent-level ignore only where still untouched (:468)
            wgt = jnp.where((wgt < 0) & ign_adj, 0.0, wgt)
            wgt = jnp.where(wgt < 0, 0.1, wgt)
            loc_targets.append(ctr.astype(jnp.float32))
            loc_weights.append(wgt)
            total_cells += b * h * w
        loc_avg_factor = total_cells / 200.0
        return loc_targets, loc_weights, loc_avg_factor

    # --------------------------------------------------- shape targets
    def _ga_shape_target_single(self, rng, featmap_sizes, squares,
                                approxs, gt_bboxes, gt_valid, pad_shape,
                                img_shape):
        sq_flags = []
        ap_flags = self.approx_gen.valid_flags(featmap_sizes, pad_shape)
        k = self.approxs_per_octave
        for lvl, af in enumerate(ap_flags):
            # any approx in the octave inside ⇒ square inside (:263)
            sq_flags.append(af.reshape(-1, k).any(-1))
        sq_valid = jnp.concatenate(sq_flags, 0)
        inside = anchor_inside_flags(
            squares, sq_valid, img_shape,
            self.train_cfg.get('allowed_border', -1))
        assign = self._ga_assigner.assign(
            squares, gt_bboxes, gt_valid, None, bbox_valid=inside,
            approxs=approxs, approxs_per_octave=k)
        samp = self._ga_sampler.sample(rng, assign, squares, gt_bboxes,
                                       gt_valid, None, bbox_valid=inside)
        n = squares.shape[0]
        bbox_anchors = jnp.zeros((n, 4), jnp.float32)
        bbox_gts = jnp.zeros((n, 4), jnp.float32)
        bbox_weights = jnp.zeros((n, 4), jnp.float32)
        pos = samp.is_pos & samp.valid
        bbox_anchors = bbox_anchors.at[samp.inds].set(
            jnp.where(pos[:, None], samp.bboxes, 0.0), mode='drop')
        bbox_gts = bbox_gts.at[samp.inds].set(
            jnp.where(pos[:, None], samp.pos_gt_bboxes, 0.0), mode='drop')
        bbox_weights = bbox_weights.at[samp.inds].set(
            jnp.where(pos[:, None], 1.0, 0.0), mode='drop')
        return (bbox_anchors, bbox_gts, bbox_weights, samp.num_pos,
                samp.num_neg)

    # ------------------------------------------------- cls/bbox targets
    def _ga_target_single(self, rng, featmap_sizes, anchors, loc_mask,
                          gt_bboxes, gt_valid, gt_labels, img_shape,
                          pad_shape):
        """AnchorHead._target_single with per-image guided anchors."""
        sq_flags = jnp.concatenate(
            self.square_gen.valid_flags(featmap_sizes, pad_shape), 0)
        inside = anchor_inside_flags(
            anchors, sq_flags, img_shape,
            self.train_cfg.get('allowed_border', -1))
        assign = self._assigner.assign(
            anchors, gt_bboxes, gt_valid,
            gt_labels if not self._is_rpn() else None, bbox_valid=inside)
        samp = self._sampler.sample(
            rng, assign, anchors, gt_bboxes, gt_valid,
            gt_labels if not self._is_rpn() else None, bbox_valid=inside)
        n = anchors.shape[0]
        bg = self.num_classes
        labels = jnp.full((n,), bg, jnp.int32)
        label_weights = jnp.zeros((n,), jnp.float32)
        bbox_targets = jnp.zeros((n, 4), jnp.float32)
        bbox_weights = jnp.zeros((n, 4), jnp.float32)
        pos = samp.is_pos
        sel = samp.valid
        pos_labels = (jnp.zeros_like(samp.pos_gt_labels)
                      if self._is_rpn()
                      else jnp.clip(samp.pos_gt_labels, 0))
        labels = labels.at[samp.inds].set(
            jnp.where(sel, jnp.where(pos, pos_labels, bg), bg),
            mode='drop')
        pw = self.train_cfg.get('pos_weight', -1)
        pw = 1.0 if pw <= 0 else float(pw)
        label_weights = label_weights.at[samp.inds].add(
            jnp.where(sel, jnp.where(pos, pw, 1.0), 0.0), mode='drop')
        slot_bt = self._bbox_coder.encode(samp.bboxes, samp.pos_gt_bboxes)
        bbox_targets = bbox_targets.at[samp.inds].set(
            jnp.where(pos[:, None], slot_bt, 0.0), mode='drop')
        bbox_weights = bbox_weights.at[samp.inds].set(
            jnp.where(pos[:, None], 1.0, 0.0), mode='drop')
        return (labels, label_weights, bbox_targets, bbox_weights,
                samp.num_pos, samp.num_neg)

    # ------------------------------------------------------------- loss
    def loss(self, rng, cls_scores, bbox_preds, shape_preds, loc_preds,
             gt_bboxes, gt_valid, gt_labels, img_shapes,
             pad_shapes) -> Dict[str, jnp.ndarray]:
        featmap_sizes = tuple((s.shape[1], s.shape[2])
                              for s in cls_scores)
        b = gt_bboxes.shape[0]

        loc_t, loc_w, loc_avg = self.ga_loc_targets(gt_bboxes, gt_valid,
                                                    featmap_sizes)
        loss_loc = sum(
            self._loss_loc(
                lp.astype(jnp.float32).reshape(-1, 1),
                lt.reshape(-1).astype(jnp.int32),
                weight=lw.reshape(-1), avg_factor=loc_avg)
            for lp, lt, lw in zip(loc_preds, loc_t, loc_w))

        squares_l = self.square_gen.grid_anchors(featmap_sizes)
        approxs_l = self.approx_gen.grid_anchors(featmap_sizes)
        flat_squares = jnp.concatenate(squares_l, 0)
        flat_approxs = jnp.concatenate(approxs_l, 0)
        rngs = jax.random.split(rng, 2 * b)
        (bb_anchors, bb_gts, bb_weights, sh_pos, sh_neg) = jax.vmap(
            lambda r, gb, gv, ps, ish: self._ga_shape_target_single(
                r, featmap_sizes, flat_squares, flat_approxs, gb, gv,
                ps, ish))(rngs[:b], gt_bboxes, gt_valid, pad_shapes,
                          img_shapes)
        anchor_total = jnp.maximum(
            jnp.sum(sh_pos + (sh_neg if self.ga_sampling else 0))
            .astype(jnp.float32), 1.0)
        shape_flat = jnp.concatenate(
            [sp.astype(jnp.float32).reshape(b, -1, 2)
             for sp in shape_preds], 1)
        deltas = jnp.concatenate(
            [jnp.zeros_like(shape_flat), shape_flat], -1)
        pred_anchors = self._anchor_coder.decode(
            bb_anchors, deltas, wh_ratio_clip=1e-6)
        loss_shape = self._loss_shape(pred_anchors, bb_gts,
                                      weight=bb_weights,
                                      avg_factor=anchor_total)

        ga_l, mask_l = self.guided_anchors(featmap_sizes, shape_preds,
                                           loc_preds,
                                           use_loc_filter=False)
        ga_flat = jnp.concatenate(ga_l, 1)                   # (B, N, 4)
        mask_flat = jnp.concatenate(mask_l, 1)
        (labels, label_weights, bbox_targets, bbox_weights, num_pos,
         num_neg) = jax.vmap(
            lambda r, a, m, gb, gv, gl, ish, ps:
            self._ga_target_single(r, featmap_sizes, a, m, gb, gv, gl,
                                   ish, ps))(
            rngs[b:], ga_flat, mask_flat, gt_bboxes, gt_valid, gt_labels,
            img_shapes, pad_shapes)
        if self.sampling:
            num_total = jnp.maximum(
                jnp.sum(num_pos + num_neg).astype(jnp.float32), 1.0)
        else:
            num_total = jnp.maximum(
                jnp.sum(num_pos).astype(jnp.float32), 1.0)

        cls_flat = jnp.concatenate([
            s.astype(jnp.float32).reshape(b, -1, self.cls_out_channels)
            for s in cls_scores], 1)
        box_flat = jnp.concatenate([
            p.astype(jnp.float32).reshape(b, -1, 4)
            for p in bbox_preds], 1)
        loss_cls = self._loss_cls(cls_flat, labels, weight=label_weights,
                                  avg_factor=num_total)
        loss_bbox = self._loss_bbox(box_flat, bbox_targets,
                                    weight=bbox_weights,
                                    avg_factor=num_total)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_shape=loss_shape, loss_loc=loss_loc)

    # ------------------------------------------------------------ boxes
    def get_bboxes(self, cls_scores, bbox_preds, shape_preds, loc_preds,
                   img_shapes, scale_factors, cfg=None,
                   rescale: bool = False, with_nms: bool = True):
        """(reference :746 get_bboxes) — loc-filtered guided anchors."""
        cfg = cfg or self.test_cfg
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        ga_l, mask_l = self.guided_anchors(featmap_sizes, shape_preds,
                                           loc_preds, use_loc_filter=True)
        nms_pre = cfg.get('nms_pre', -1)
        b = cls_scores[0].shape[0]

        def per_image(scores_lvls, preds_lvls, ga_lvls, mask_lvls,
                      img_shape, scale_factor):
            mlvl_boxes, mlvl_scores = [], []
            for lvl in range(len(scores_lvls)):
                s = scores_lvls[lvl].reshape(-1, self.cls_out_channels)
                s = (jax.nn.sigmoid(s) if self.use_sigmoid_cls
                     else jax.nn.softmax(s, axis=-1))
                s = jnp.where(mask_lvls[lvl][:, None], s, 0.0)
                p = preds_lvls[lvl].reshape(-1, 4)
                a = ga_lvls[lvl]
                if 0 < nms_pre < s.shape[0]:
                    max_s = (s.max(-1) if self.use_sigmoid_cls
                             else s[:, :-1].max(-1))
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
                scores = jnp.concatenate(
                    [scores, jnp.zeros_like(scores[:, :1])], -1)
            if not with_nms:
                return boxes, scores
            return multiclass_nms(
                boxes, scores, cfg['score_thr'], dict(cfg['nms']),
                cfg.get('max_per_img', 100))

        return jax.vmap(per_image)(
            [s.reshape(b, -1, self.cls_out_channels) for s in cls_scores],
            [p.reshape(b, -1, 4) for p in bbox_preds],
            ga_l, mask_l, img_shapes, scale_factors)


@HEADS.register_module()
class GARPNHead(GuidedAnchorHead):
    """(reference: ga_rpn_head.py:17)."""
    num_classes: int = 1
    IS_RPN = True
    HAS_LOC_FILTER = True   # two_stage passes use_loc_filter=False in train

    def _init_layers(self):
        self.rpn_conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                                dtype=self.dtype,
                                kernel_init=normal_init(0.01),
                                name='rpn_conv')
        super()._init_layers()

    def forward_single(self, x, train: bool = False):
        x = nn.relu(self.rpn_conv(x))
        return super().forward_single(x, train)

    def loss(self, rng, cls_scores, bbox_preds, shape_preds, loc_preds,
             gt_bboxes, gt_valid, gt_labels, img_shapes, pad_shapes):
        losses = super().loss(rng, cls_scores, bbox_preds, shape_preds,
                              loc_preds, gt_bboxes, gt_valid, None,
                              img_shapes, pad_shapes)
        return dict(loss_rpn_cls=losses['loss_cls'],
                    loss_rpn_bbox=losses['loss_bbox'],
                    loss_anchor_shape=losses['loss_shape'],
                    loss_anchor_loc=losses['loss_loc'])

    def get_proposals(self, cls_scores, bbox_preds, shape_preds,
                      loc_preds, img_shapes, cfg,
                      use_loc_filter: bool = True):
        """(reference: ga_rpn_head.py:66) per-level NMS via level-offset
        batched NMS + global top max_per_img. The reference's per-level
        nms_post truncation is vacuous here (nms_pre <= nms_post in
        every shipped config)."""
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        ga_l, mask_l = self.guided_anchors(featmap_sizes, shape_preds,
                                           loc_preds, use_loc_filter)
        nms_pre = cfg.get('nms_pre', 1000)
        max_per_img = cfg.get('max_per_img', cfg.get('max_num', 1000))
        min_bbox_size = cfg.get('min_bbox_size', 0)
        iou_thr = dict(cfg['nms'])['iou_threshold'] if 'nms' in cfg \
            else cfg.get('nms_thr', 0.7)
        b = cls_scores[0].shape[0]
        flat_scores = [s.reshape(b, -1) for s in cls_scores]
        flat_preds = [p.reshape(b, -1, 4) for p in bbox_preds]

        def per_image(scores_lvls, preds_lvls, ga_lvls, mask_lvls,
                      img_shape):
            all_boxes, all_scores, all_ids, all_valid = [], [], [], []
            for lvl in range(len(scores_lvls)):
                score = jax.nn.sigmoid(
                    scores_lvls[lvl].astype(jnp.float32))
                score = jnp.where(mask_lvls[lvl], score, -1.0)
                k = min(nms_pre, score.shape[0])
                top_s, top_i = fast_topk(score, k)
                boxes = self._bbox_coder.decode(
                    ga_lvls[lvl][top_i], preds_lvls[lvl][top_i],
                    max_shape=img_shape)
                valid = top_s >= 0.0          # loc-masked slots
                if min_bbox_size > 0:
                    w = boxes[:, 2] - boxes[:, 0]
                    h = boxes[:, 3] - boxes[:, 1]
                    valid &= (w >= min_bbox_size) & (h >= min_bbox_size)
                all_boxes.append(boxes)
                all_scores.append(top_s)
                all_ids.append(jnp.full((k,), lvl, jnp.int32))
                all_valid.append(valid)
            boxes = jnp.concatenate(all_boxes, 0)
            scores = jnp.concatenate(all_scores, 0)
            ids = jnp.concatenate(all_ids, 0)
            valid = jnp.concatenate(all_valid, 0)
            res = batched_nms(boxes, scores, ids, iou_thr, max_per_img,
                              valid=valid)
            return res.dets[:, :4], res.dets[:, 4], res.valid

        return jax.vmap(per_image)(flat_scores, flat_preds, ga_l,
                                   mask_l, img_shapes)


@HEADS.register_module()
class GARetinaHead(GuidedAnchorHead):
    """(reference: ga_retina_head.py:11) — retina towers + dual feature
    adaption."""
    stacked_convs: int = 4
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None

    def _init_layers(self):
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
        self.conv_loc = nn.Conv(1, (1, 1), dtype=self.dtype,
                                kernel_init=normal_init(0.01),
                                bias_init=bias_prob_init(0.01),
                                name='conv_loc')
        self.conv_shape = nn.Conv(2, (1, 1), dtype=self.dtype,
                                  kernel_init=normal_init(0.01),
                                  name='conv_shape')
        self.feature_adaption_cls = FeatureAdaption(
            self.feat_channels, deform_groups=self.deform_groups,
            dtype=self.dtype, name='feature_adaption_cls')
        self.feature_adaption_reg = FeatureAdaption(
            self.feat_channels, deform_groups=self.deform_groups,
            dtype=self.dtype, name='feature_adaption_reg')
        self.retina_cls = MaskedConv2d(
            self.cls_out_channels, 3, padding=1, dtype=self.dtype,
            kernel_init=normal_init(0.01),
            bias_init=bias_prob_init(0.01), name='retina_cls')
        self.retina_reg = MaskedConv2d(
            4, 3, padding=1, dtype=self.dtype,
            kernel_init=normal_init(0.01), name='retina_reg')

    def forward_single(self, x, train: bool = False):
        cls_feat = x
        reg_feat = x
        for conv in self.cls_convs:
            cls_feat = conv(cls_feat, train=train)
        for conv in self.reg_convs:
            reg_feat = conv(reg_feat, train=train)
        loc_pred = self.conv_loc(cls_feat)
        shape_pred = self.conv_shape(reg_feat)
        cls_feat = self.feature_adaption_cls(cls_feat, shape_pred)
        reg_feat = self.feature_adaption_reg(reg_feat, shape_pred)
        mask = (None if train else
                jax.nn.sigmoid(loc_pred.astype(jnp.float32))
                >= self.loc_filter_thr)
        cls_score = self.retina_cls(cls_feat, mask)
        bbox_pred = self.retina_reg(reg_feat, mask)
        return cls_score, bbox_pred, shape_pred, loc_pred
