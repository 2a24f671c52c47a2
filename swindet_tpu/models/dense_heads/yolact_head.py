"""YOLACT (reference: mmdet/models/dense_heads/yolact_head.py:14
YOLACTHead, :461 YOLACTSegmHead, :577 YOLACTProtonet;
arXiv:1904.02689) — real-time instance segmentation: anchor head with
mask-coefficient branch, a protonet producing shared prototype masks,
and a train-only semantic segmentation head.

TPU-native notes:
- Fast NMS is already pure matrix algebra → core/nms.py fast_nms.
- The per-image mask path runs on fixed ``max_masks_to_train`` slots
  (random subset of positive anchors, validity-masked losses).
- Test-time instance masks are re-sampled to per-detection 28×28
  patches with the separable-crop matrices, so the standard host-side
  paste/RLE pipeline applies unchanged (the reference instead keeps
  stride-4 full-image masks and resizes at the end — same masks, same
  0.5 threshold, different intermediate representation)."""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS, build_loss
from ..layers import ConvModule, xavier_init
from ...core.nms import fast_nms
from .anchor_head import AnchorHead

EPS = 1e-6


def crop_by_boxes(masks, boxes_rel, padding: int = 1):
    """Zero out mask pixels outside each (relative-coordinate) box
    (reference :863 crop + :897 sanitize_coordinates).
    masks (M, H, W); boxes_rel (M, 4) in [0, 1]."""
    m, h, w = masks.shape
    x1 = boxes_rel[:, 0] * w
    x2 = boxes_rel[:, 2] * w
    y1 = boxes_rel[:, 1] * h
    y2 = boxes_rel[:, 3] * h
    x1, x2 = jnp.minimum(x1, x2), jnp.maximum(x1, x2)
    y1, y2 = jnp.minimum(y1, y2), jnp.maximum(y1, y2)
    x1 = jnp.clip(x1 - padding, 0)
    x2 = jnp.clip(x2 + padding, None, w)
    y1 = jnp.clip(y1 - padding, 0)
    y2 = jnp.clip(y2 + padding, None, h)
    cols = jnp.arange(w, dtype=jnp.float32)
    rows = jnp.arange(h, dtype=jnp.float32)
    mx = (cols[None, None, :] >= x1[:, None, None]) & \
         (cols[None, None, :] < x2[:, None, None])
    my = (rows[None, :, None] >= y1[:, None, None]) & \
         (rows[None, :, None] < y2[:, None, None])
    return masks * (mx & my).astype(masks.dtype)


def crop_resize(maps, boxes, size: int):
    """Bilinear crop of per-instance full-frame maps to (M, s, s)
    patches (separable interp matrices — same machinery as the mask
    targets). maps (M, H, W) in the same frame as boxes (M, 4)."""
    from ...ops.roi_align import SR0_GMAX, adaptive_grid
    from ...ops.roi_align_pallas import _interp_matrices
    m, hh, ww = maps.shape
    s = size
    r = SR0_GMAX
    x1 = boxes[:, 0] - 0.5
    y1 = boxes[:, 1] - 0.5
    x2 = boxes[:, 2] - 0.5
    y2 = boxes[:, 3] - 0.5
    bins = jnp.arange(s, dtype=jnp.float32)
    sub_y, _, g_y = adaptive_grid(y2 - y1, s, r)
    sub_x, _, g_x = adaptive_grid(x2 - x1, s, r)
    ys = y1[:, None, None] + (bins[None, None, :] + sub_y[:, :, None]) \
        * ((y2 - y1) / s)[:, None, None]
    xs = x1[:, None, None] + (bins[None, None, :] + sub_x[:, :, None]) \
        * ((x2 - x1) / s)[:, None, None]
    slot = jnp.arange(r, dtype=jnp.float32)[None, :, None]
    ys = jnp.where((ys >= -1.0) & (ys <= hh)
                   & (slot < g_y[:, None, None]), ys, -2.0)
    xs = jnp.where((xs >= -1.0) & (xs <= ww)
                   & (slot < g_x[:, None, None]), xs, -2.0)
    hs = jnp.full((m,), hh, jnp.int32)
    wsz = jnp.full((m,), ww, jnp.int32)
    zero = jnp.zeros((m,), jnp.int32)
    ay = _interp_matrices(ys, hs, zero, hh, r, s, g_y)
    ax = _interp_matrices(xs, wsz, zero, ww, r, s, g_x)
    t = jnp.einsum('moh,mhw->mow', ay, maps.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum('mow,mpw->mop', t, ax,
                      precision=jax.lax.Precision.HIGHEST)


@HEADS.register_module()
class YOLACTHead(AnchorHead):
    """Anchor head + tanh mask-coefficient branch, OHEM CE loss."""
    num_head_convs: int = 1
    num_protos: int = 32
    use_ohem: bool = True

    def _init_layers(self):
        self.head_convs = [
            ConvModule(self.feat_channels, 3, padding=1,
                       act_cfg=dict(type='ReLU'), dtype=self.dtype,
                       kernel_init=xavier_init(),
                       name=f'head_convs{i}')
            for i in range(self.num_head_convs)]
        self.conv_cls = nn.Conv(
            self.num_base_priors * self.cls_out_channels, (3, 3),
            padding=[(1, 1)] * 2, dtype=self.dtype,
            kernel_init=xavier_init(), name='conv_cls')
        self.conv_reg = nn.Conv(
            self.num_base_priors * 4, (3, 3), padding=[(1, 1)] * 2,
            dtype=self.dtype, kernel_init=xavier_init(),
            name='conv_reg')
        self.conv_coeff = nn.Conv(
            self.num_base_priors * self.num_protos, (3, 3),
            padding=[(1, 1)] * 2, dtype=self.dtype,
            kernel_init=xavier_init(), name='conv_coeff')

    def forward_single(self, x, train: bool = False):
        for conv in self.head_convs:
            x = conv(x, train=train)
        return (self.conv_cls(x), self.conv_reg(x),
                jnp.tanh(self.conv_coeff(x)))

    # loss returns (losses, aux) — aux feeds the protonet mask loss
    def loss_with_aux(self, rng, cls_scores, bbox_preds, gt_bboxes,
                      gt_valid, gt_labels, img_shapes, pad_shapes):
        """SSD-style OHEM CE + SmoothL1 (reference loss_single_OHEM
        :260); also returns per-anchor pos mask + matched gt index."""
        featmap_sizes = tuple((s.shape[1], s.shape[2])
                              for s in cls_scores)
        anchor_list = self.get_anchors(featmap_sizes)
        flat_anchors = jnp.concatenate(anchor_list, 0)
        b = gt_bboxes.shape[0]
        from ...core.anchors import anchor_inside_flags

        def target_single(gb, gv, gl, ish, ps):
            valid_flags = jnp.concatenate(
                self.prior_generator.valid_flags(featmap_sizes, ps), 0)
            inside = anchor_inside_flags(
                flat_anchors, valid_flags, ish,
                self.train_cfg.get('allowed_border', -1))
            assign = self._assigner.assign(flat_anchors, gb, gv, gl,
                                           bbox_valid=inside)
            pos = assign.gt_inds > 0
            pos_gt = jnp.clip(assign.gt_inds - 1, 0)
            labels = jnp.where(pos, jnp.clip(assign.labels, 0),
                               self.num_classes)
            lw = (inside & (assign.gt_inds >= 0)).astype(jnp.float32)
            gt_box = jnp.take(gb, pos_gt, axis=0)
            bt = self._bbox_coder.encode(flat_anchors, gt_box)
            bw = pos[:, None].astype(jnp.float32)
            return labels, lw, bt, bw, pos, pos_gt

        labels, lw, bt, bw, pos, pos_gt = jax.vmap(target_single)(
            gt_bboxes, gt_valid, gt_labels, img_shapes, pad_shapes)
        num_pos = jnp.sum(pos, axis=1)
        num_total_pos = jnp.maximum(
            jnp.sum(num_pos).astype(jnp.float32), 1.0)

        cls_flat = jnp.concatenate([
            s.astype(jnp.float32).reshape(b, -1, self.cls_out_channels)
            for s in cls_scores], 1)
        box_flat = jnp.concatenate([
            p.astype(jnp.float32).reshape(b, -1, 4)
            for p in bbox_preds], 1)
        ratio = float(self.train_cfg.get('neg_pos_ratio', 3))

        def per_image(scores, bflat, labels_i, lw_i, bt_i, bw_i, np_i):
            logp = jax.nn.log_softmax(scores, axis=-1)
            ce = -jnp.take_along_axis(
                logp, jnp.clip(labels_i, 0)[:, None], -1)[:, 0] * lw_i
            posm = labels_i < self.num_classes
            neg = (labels_i == self.num_classes) & (lw_i > 0)
            neg_ce = jnp.where(neg, ce, -jnp.inf)
            order = jnp.argsort(-neg_ce)
            rank = jnp.zeros_like(order).at[order].set(
                jnp.arange(order.shape[0]))
            kk = jnp.minimum((ratio * np_i).astype(jnp.int32),
                             jnp.sum(neg).astype(jnp.int32))
            keep_neg = neg & (rank < kk)
            loss_cls = jnp.sum(jnp.where(posm | keep_neg, ce, 0.0))
            beta = 1.0
            diff = jnp.abs(bflat - bt_i)
            sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                            diff - 0.5 * beta)
            loss_bbox = jnp.sum(sl1 * bw_i)
            return loss_cls, loss_bbox

        lc, lb = jax.vmap(per_image)(cls_flat, box_flat, labels, lw, bt,
                                     bw, num_pos)
        losses = dict(
            loss_cls=jnp.sum(lc) / num_total_pos,
            loss_bbox=1.5 * jnp.sum(lb) / num_total_pos)
        return losses, dict(pos=pos, pos_gt=pos_gt)

    def get_bboxes(self, cls_scores, bbox_preds, coeff_preds, img_shapes,
                   scale_factors, cfg=None, rescale: bool = True,
                   with_nms: bool = True):
        """Per-level top-k candidates → Fast NMS (reference :296)."""
        cfg = dict(cfg or self.test_cfg)
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        anchors = self.get_anchors(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)
        b = cls_scores[0].shape[0]

        def per_image(scores_lvls, preds_lvls, coeff_lvls, img_shape,
                      scale_factor):
            mlvl_boxes, mlvl_scores, mlvl_coeffs = [], [], []
            for lvl in range(len(scores_lvls)):
                sc = scores_lvls[lvl].reshape(-1, self.cls_out_channels)
                sc = (jax.nn.sigmoid(sc) if self.use_sigmoid_cls
                      else jax.nn.softmax(sc, -1))
                bp = preds_lvls[lvl].reshape(-1, 4)
                cp = coeff_lvls[lvl].reshape(-1, self.num_protos)
                a = anchors[lvl]
                if 0 < nms_pre < sc.shape[0]:
                    from ...core.nms import fast_topk
                    ms = (sc.max(-1) if self.use_sigmoid_cls
                          else sc[:, :-1].max(-1))
                    _, topk = fast_topk(ms, nms_pre)
                    sc, bp, cp, a = sc[topk], bp[topk], cp[topk], a[topk]
                boxes = self._bbox_coder.decode(a, bp,
                                                max_shape=img_shape)
                mlvl_boxes.append(boxes)
                mlvl_scores.append(sc)
                mlvl_coeffs.append(cp)
            boxes = jnp.concatenate(mlvl_boxes, 0)
            scores = jnp.concatenate(mlvl_scores, 0)
            coeffs = jnp.concatenate(mlvl_coeffs, 0)
            if rescale:
                boxes = boxes / scale_factor[None, :4]
            if self.use_sigmoid_cls:
                scores = jnp.concatenate(
                    [scores, jnp.zeros_like(scores[:, :1])], -1)
            return fast_nms(boxes, scores, coeffs, cfg['score_thr'],
                            dict(cfg['nms'])['iou_threshold'],
                            cfg.get('top_k', 200),
                            cfg.get('max_per_img', 100))

        return jax.vmap(per_image)(
            [s.astype(jnp.float32).reshape(b, -1, self.cls_out_channels)
             for s in cls_scores],
            [p.astype(jnp.float32).reshape(b, -1, 4)
             for p in bbox_preds],
            [p.astype(jnp.float32).reshape(b, -1, self.num_protos)
             for p in coeff_preds],
            img_shapes, scale_factors)


@HEADS.register_module()
class YOLACTSegmHead(nn.Module):
    """Train-only per-class semantic head (reference :461)."""
    num_classes: int = 80
    in_channels: int = 256
    loss_segm: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        self._loss_segm = build_loss(dict(
            self.loss_segm or dict(type='CrossEntropyLoss',
                                   use_sigmoid=True, loss_weight=1.0)))
        self.segm_conv = nn.Conv(self.num_classes, (1, 1),
                                 dtype=self.dtype,
                                 kernel_init=xavier_init(),
                                 name='segm_conv')

    def __call__(self, x):
        return self.segm_conv(x)

    def loss(self, segm_pred, gt_masks, gt_valid, gt_labels):
        """segm_pred (B, H, W, C); gt_masks (B, G, Him, Wim)."""
        b, h, w, c = segm_pred.shape
        from ..layers import resize_nearest
        # per-class max over gt masks of that class (reference :545
        # uses interpolate+threshold; nearest downsample then max)
        gm = jax.image.resize(gt_masks.astype(jnp.float32),
                              (b, gt_masks.shape[1], h, w), 'bilinear')
        gm = (gm > 0.5).astype(jnp.float32)
        gm = gm * gt_valid[..., None, None]
        # the reference writes segm_targets[label - 1] (yolact_head.py
        # :570 — a 1-based-label relic kept in mmdet), so label 0 wraps
        # to the LAST channel; replicated for checkpoint parity
        onehot = jax.nn.one_hot((gt_labels - 1) % c, c) \
            * gt_valid[..., None]
        target = jnp.einsum('bghw,bgc->bhwc', gm, onehot)
        target = (target > 0).astype(jnp.float32)
        loss = self._loss_segm(
            segm_pred.astype(jnp.float32).reshape(-1, c),
            target.reshape(-1, c),
            avg_factor=float(b * h * w))
        return dict(loss_segm=loss)


@HEADS.register_module()
class YOLACTProtonet(nn.Module):
    """Prototype-mask generator (reference :577)."""
    num_classes: int = 80
    in_channels: int = 256
    proto_channels: Sequence = (256, 256, 256, None, 256, 32)
    proto_kernel_sizes: Sequence = (3, 3, 3, -2, 3, 1)
    include_last_relu: bool = True
    num_protos: int = 32
    loss_mask_weight: float = 1.0
    max_masks_to_train: int = 100
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..layers import resize_nearest
        li = 0
        n = len(self.proto_channels)
        for i, (ch, ks) in enumerate(zip(self.proto_channels,
                                         self.proto_kernel_sizes)):
            if ks > 0:
                x = nn.Conv(ch, (ks, ks), padding=[(ks // 2,) * 2] * 2,
                            dtype=self.dtype, kernel_init=xavier_init(),
                            name=f'conv{i}')(x)
            elif ch is None:
                b, h, w, cc = x.shape
                x = jax.image.resize(x, (b, h * (-ks), w * (-ks), cc),
                                     'bilinear')
            else:
                x = nn.ConvTranspose(ch, (-ks, -ks),
                                     strides=(-ks, -ks),
                                     dtype=self.dtype,
                                     kernel_init=xavier_init(),
                                     name=f'deconv{i}')(x)
            if i < n - 1 or self.include_last_relu:
                x = nn.relu(x)
        return x                                           # (B,Hp,Wp,P)
