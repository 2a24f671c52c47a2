"""DETR transformer head (reference:
mmdet/models/dense_heads/transformer_head.py:17 TransformerHead).

TPU-native: the per-image scipy Hungarian round-trip becomes an
in-jit LSA (core/bbox/lsa.py) vmapped over the batch; the padding mask
is derived at feature resolution directly from ``img_shapes`` (the
reference builds a full-res mask and nearest-interpolates it —
transformer_head.py:237-245 — which for an integer stride reduces to
``feat_coord * stride < img_shape``).

The bg-class weight (0.1) is applied as per-sample label weights:
mmdet's CE ``class_weight`` vector is 1 everywhere except the bg
column, so weighting bg-labeled samples by ``bg_cls_weight`` is
numerically identical (transformer_head.py:103-120).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS, build_loss
from ..transformer import DetrTransformer, sine_positional_encoding
from ...core.bbox.transforms import bbox_cxcywh_to_xyxy
from ...core.bbox.assigners import HungarianAssigner


@HEADS.register_module()
class TransformerHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 2048
    num_fcs: int = 2
    transformer: Optional[dict] = None
    positional_encoding: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    loss_iou: Optional[dict] = None
    strides: Sequence[int] = (32,)
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        tcfg = dict(self.transformer or {})
        tcfg.pop('type', None)
        tcfg.pop('act_cfg', None)
        tcfg.pop('norm_cfg', None)
        tcfg.pop('pre_norm', None)
        self.embed_dims = tcfg.get('embed_dims', 256)
        self._transformer = DetrTransformer(
            dtype=self.dtype, name='transformer', **tcfg)
        pcfg = dict(self.positional_encoding or dict(num_feats=128,
                                                     normalize=True))
        pcfg.pop('type', None)
        self._pos_cfg = pcfg

        lc = dict(self.loss_cls or dict(type='CrossEntropyLoss',
                                        use_sigmoid=False, loss_weight=1.0,
                                        bg_cls_weight=0.1))
        self.bg_cls_weight = lc.pop('bg_cls_weight', 1.0)
        lc.pop('class_weight', None)
        self._loss_cls = build_loss(lc)
        self._loss_bbox = build_loss(dict(
            self.loss_bbox or dict(type='L1Loss', loss_weight=5.0)))
        self._loss_iou = build_loss(dict(
            self.loss_iou or dict(type='GIoULoss', loss_weight=2.0)))
        tr = dict(self.train_cfg or {})
        acfg = dict(tr.get('assigner', dict(
            type='HungarianAssigner',
            cls_cost=dict(type='ClassificationCost', weight=1.),
            reg_cost=dict(type='BBoxL1Cost', weight=5.0),
            iou_cost=dict(type='IoUCost', iou_mode='giou', weight=2.0))))
        acfg.pop('type', None)
        self._assigner = HungarianAssigner(**acfg)

        self.num_query = dict(self.test_cfg or {}).get('max_per_img', 100)
        self.cls_out_channels = self.num_classes + 1
        self.input_proj = nn.Dense(self.embed_dims, dtype=self.dtype,
                                   name='input_proj')
        self.fc_cls = nn.Dense(self.cls_out_channels, dtype=self.dtype,
                               name='fc_cls')
        self.reg_ffn = [nn.Dense(self.embed_dims, dtype=self.dtype,
                                 name=f'reg_ffn{i}')
                        for i in range(self.num_fcs)]
        self.fc_reg = nn.Dense(4, dtype=self.dtype, name='fc_reg')
        self.query_embedding = self.param(
            'query_embedding', nn.initializers.normal(1.0),
            (self.num_query, self.embed_dims))

    def _feat_mask(self, feat_hw, img_shapes, stride):
        """(B, h, w) bool valid-pixel mask at feature resolution."""
        h, w = feat_hw
        yy = jnp.arange(h, dtype=jnp.int32)[None, :, None] * stride
        xx = jnp.arange(w, dtype=jnp.int32)[None, None, :] * stride
        return ((yy < img_shapes[:, 0, None, None]) &
                (xx < img_shapes[:, 1, None, None]))

    def __call__(self, feats, img_shapes, train: bool = False):
        """feats: FPN/backbone tuple — only the last level is consumed
        (transformer_head.py:212 runs per level; the DETR config feeds a
        single C5 level). Returns (all_cls (L, B, Q, C+1),
        all_bbox (L, B, Q, 4) sigmoid cxcywh)."""
        x = feats[-1]
        b, h, w, _ = x.shape
        stride = self.strides[-1]
        not_pad = self._feat_mask((h, w), img_shapes, stride)
        x = self.input_proj(x)
        pos = sine_positional_encoding(not_pad, **self._pos_cfg) \
            .astype(self.dtype)
        x_seq = x.reshape(b, h * w, self.embed_dims)
        pos_seq = pos.reshape(b, h * w, self.embed_dims)
        pad_seq = ~not_pad.reshape(b, h * w)
        outs_dec, _ = self._transformer(
            x_seq, pad_seq, self.query_embedding, pos_seq,
            deterministic=not train)
        all_cls = self.fc_cls(outs_dec).astype(jnp.float32)
        y = outs_dec
        for fc in self.reg_ffn:
            y = nn.relu(fc(y))
        all_bbox = jax.nn.sigmoid(self.fc_reg(y).astype(jnp.float32))
        return all_cls, all_bbox

    # ---------------------------------------------------------------- loss
    def _loss_single(self, cls_scores, bbox_preds, gt_bboxes, gt_valid,
                     gt_labels, img_whwh):
        """One decoder layer (transformer_head.py:324 loss_single).
        cls_scores (B, Q, C+1); bbox_preds (B, Q, 4)."""
        b, q, _ = cls_scores.shape

        def assign_one(cp, bp, gb, gv, gl, whwh):
            res = self._assigner.assign(bp, cp, gb, gv, gl, whwh)
            return res.gt_inds, res.labels

        gt_inds, labels = jax.vmap(assign_one)(
            cls_scores, bbox_preds, gt_bboxes, gt_valid, gt_labels,
            img_whwh)                                   # (B, Q) each
        pos = gt_inds > 0
        labels = jnp.where(pos, labels, self.num_classes)
        num_pos = jnp.sum(pos).astype(jnp.float32)
        num_neg = b * q - num_pos
        label_weights = jnp.where(pos, 1.0, self.bg_cls_weight)
        cls_avg = num_pos + num_neg * self.bg_cls_weight
        loss_cls = self._loss_cls(
            cls_scores.reshape(-1, self.cls_out_channels),
            labels.reshape(-1), weight=label_weights.reshape(-1),
            avg_factor=jnp.maximum(cls_avg, 1.0))

        # normalized cxcywh targets of the matched gt per query
        gi = jnp.clip(gt_inds - 1, 0)
        gt_q = jnp.take_along_axis(gt_bboxes, gi[..., None], axis=1)
        norm_gt = gt_q / img_whwh[:, None, :]
        cx = (norm_gt[..., 0] + norm_gt[..., 2]) * 0.5
        cy = (norm_gt[..., 1] + norm_gt[..., 3]) * 0.5
        bw = norm_gt[..., 2] - norm_gt[..., 0]
        bh = norm_gt[..., 3] - norm_gt[..., 1]
        tgt_cxcywh = jnp.stack([cx, cy, bw, bh], -1)
        wts = pos[..., None].astype(jnp.float32)
        avg = jnp.maximum(num_pos, 1.0)
        loss_bbox = self._loss_bbox(
            bbox_preds.reshape(-1, 4), tgt_cxcywh.reshape(-1, 4),
            weight=wts.reshape(-1, 1), avg_factor=avg)
        boxes = bbox_cxcywh_to_xyxy(bbox_preds) * img_whwh[:, None, :]
        boxes_gt = bbox_cxcywh_to_xyxy(tgt_cxcywh) * img_whwh[:, None, :]
        loss_iou = self._loss_iou(
            boxes.reshape(-1, 4), boxes_gt.reshape(-1, 4),
            weight=wts.reshape(-1, 1)[..., 0], avg_factor=avg)
        return loss_cls, loss_bbox, loss_iou

    def loss(self, rng, all_cls, all_bbox, gt_bboxes, gt_valid, gt_labels,
             img_shapes, pad_shapes) -> Dict[str, jnp.ndarray]:
        img_whwh = jnp.stack([img_shapes[:, 1], img_shapes[:, 0],
                              img_shapes[:, 1], img_shapes[:, 0]],
                             -1).astype(jnp.float32)
        losses: Dict[str, jnp.ndarray] = {}
        n_layers = all_cls.shape[0]
        for li in range(n_layers):
            lc, lb, liou = self._loss_single(
                all_cls[li], all_bbox[li], gt_bboxes, gt_valid,
                gt_labels, img_whwh)
            if li == n_layers - 1:
                losses['loss_cls'] = lc
                losses['loss_bbox'] = lb
                losses['loss_iou'] = liou
            else:
                losses[f'd{li}.loss_cls'] = lc
                losses[f'd{li}.loss_bbox'] = lb
                losses[f'd{li}.loss_iou'] = liou
        return losses

    # --------------------------------------------------------------- boxes
    def get_bboxes(self, all_cls, all_bbox, img_shapes, scale_factors,
                   cfg=None, rescale: bool = True):
        """No NMS — top-scoring class per query, all queries kept
        (transformer_head.py:612 _get_bboxes_single)."""
        cls_scores = all_cls[-1]
        bbox_preds = all_bbox[-1]
        scores_all = jax.nn.softmax(cls_scores.astype(jnp.float32), -1)
        scores, det_labels = (scores_all[..., :-1].max(-1),
                              scores_all[..., :-1].argmax(-1))
        img_whwh = jnp.stack([img_shapes[:, 1], img_shapes[:, 0],
                              img_shapes[:, 1], img_shapes[:, 0]],
                             -1).astype(jnp.float32)
        boxes = bbox_cxcywh_to_xyxy(bbox_preds) * img_whwh[:, None, :]
        boxes = jnp.clip(boxes, 0.0, img_whwh[:, None, :])
        if rescale:
            boxes = boxes / scale_factors[:, None, :4]
        dets = jnp.concatenate([boxes, scores[..., None]], -1)
        valid = jnp.ones(dets.shape[:2], bool)
        return dets, det_labels.astype(jnp.int32), valid
