"""Sparse R-CNN RoI head (reference:
mmdet/models/roi_heads/sparse_roi_head.py:10 SparseRoIHead +
bbox_heads/dii_head.py:16 DIIHead).

TPU-native: the iterative 6-stage refinement keeps everything batched
(B, P, ...) — proposals never collapse to per-image python lists; the
Hungarian assignment per stage/image runs in-jit (core/bbox/lsa.py)
and targets are gathered with padded-GT masks.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS, build_loss, build_roi_extractor
from ..transformer import DynamicConv, FFN, MultiHeadAttention
from ...core.bbox.assigners import HungarianAssigner
from ...core.bbox.coders import DeltaXYWHBBoxCoder
from ...core.bbox.transforms import bbox_xyxy_to_cxcywh
from ...core.nms import fast_topk


@HEADS.register_module()
class DIIHead(nn.Module):
    """Dynamic Instance Interactive head — one refinement stage
    (dii_head.py:16)."""
    num_classes: int = 80
    num_ffn_fcs: int = 2
    num_heads: int = 8
    num_cls_fcs: int = 1
    num_reg_fcs: int = 3
    feedforward_channels: int = 2048
    in_channels: int = 256
    dropout: float = 0.0
    dynamic_conv_cfg: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    loss_iou: Optional[dict] = None
    bbox_coder: Optional[dict] = None
    ffn_act_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        self._loss_cls = build_loss(dict(
            self.loss_cls or dict(type='FocalLoss', use_sigmoid=True,
                                  gamma=2.0, alpha=0.25,
                                  loss_weight=2.0)))
        self.use_sigmoid_cls = dict(
            self.loss_cls or {}).get('use_sigmoid', True)
        self._loss_bbox = build_loss(dict(
            self.loss_bbox or dict(type='L1Loss', loss_weight=5.0)))
        self._loss_iou = build_loss(dict(
            self.loss_iou or dict(type='GIoULoss', loss_weight=2.0)))
        bc = dict(self.bbox_coder or dict(
            clip_border=False, target_means=[0., 0., 0., 0.],
            target_stds=[0.5, 0.5, 1., 1.]))
        bc.pop('type', None)
        self._bbox_coder = DeltaXYWHBBoxCoder(**bc)

        d = self.in_channels
        self.attention = MultiHeadAttention(d, self.num_heads,
                                            self.dropout, self.dtype,
                                            name='attention')
        self.attention_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                           name='attention_norm')
        dcfg = dict(self.dynamic_conv_cfg or dict(
            in_channels=d, feat_channels=64, out_channels=d,
            input_feat_shape=7))
        dcfg.pop('type', None)
        dcfg.pop('act_cfg', None)
        dcfg.pop('norm_cfg', None)
        self.instance_interactive_conv = DynamicConv(
            dtype=self.dtype, name='instance_interactive_conv', **dcfg)
        self.iic_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='iic_norm')
        self.ffn = FFN(d, self.feedforward_channels, self.num_ffn_fcs,
                       self.dropout, dtype=self.dtype, name='ffn')
        self.ffn_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='ffn_norm')
        self.cls_fcs = [
            (nn.Dense(d, use_bias=False, dtype=self.dtype,
                      name=f'cls_fc{i}'),
             nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f'cls_ln{i}'))
            for i in range(self.num_cls_fcs)]
        self.reg_fcs = [
            (nn.Dense(d, use_bias=False, dtype=self.dtype,
                      name=f'reg_fc{i}'),
             nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f'reg_ln{i}'))
            for i in range(self.num_reg_fcs)]
        out_cls = self.num_classes if self.use_sigmoid_cls \
            else self.num_classes + 1
        self.fc_cls = nn.Dense(out_cls, dtype=self.dtype, name='fc_cls')
        self.fc_reg = nn.Dense(4, dtype=self.dtype, name='fc_reg')

    def __call__(self, roi_feat, proposal_feat, train: bool = False):
        """roi_feat (B*P, S, S, C); proposal_feat (B, P, C).
        Returns (cls (B, P, K), delta (B, P, 4), obj_feat (B, P, C))."""
        b, p, c = proposal_feat.shape
        # proposal self-attention (per image, over the P proposals)
        x = self.attention(proposal_feat, proposal_feat, proposal_feat,
                           deterministic=not train)
        x = self.attention_norm(x)
        # instance-interactive dynamic conv against the RoI features
        flat = x.reshape(b * p, c)
        roi_seq = roi_feat.reshape(b * p, -1, roi_feat.shape[-1])
        iic = self.instance_interactive_conv(flat, roi_seq)
        obj = self.iic_norm(flat + iic)
        obj = self.ffn_norm(self.ffn(obj, deterministic=not train))
        cls_feat = obj
        for fc, ln in self.cls_fcs:
            cls_feat = nn.relu(ln(fc(cls_feat)))
        reg_feat = obj
        for fc, ln in self.reg_fcs:
            reg_feat = nn.relu(ln(fc(reg_feat)))
        cls_score = self.fc_cls(cls_feat).astype(jnp.float32)
        bbox_delta = self.fc_reg(reg_feat).astype(jnp.float32)
        return (cls_score.reshape(b, p, -1), bbox_delta.reshape(b, p, 4),
                obj.reshape(b, p, c).astype(self.dtype))

    def refine_bboxes(self, proposals, deltas):
        """Decode per-proposal deltas into refined xyxy boxes
        (sparse_roi_head.py:116 refine_bboxes with the 0.5/0.5/1/1-std
        coder)."""
        return self._bbox_coder.decode(proposals.reshape(-1, 4),
                                       deltas.reshape(-1, 4)).reshape(
                                           proposals.shape)


@HEADS.register_module()
class SparseRoIHead(nn.Module):
    num_stages: int = 6
    stage_loss_weights: Sequence[float] = (1., 1., 1., 1., 1., 1.)
    proposal_feature_channel: int = 256
    bbox_roi_extractor: Optional[dict] = None
    bbox_head: Optional[Any] = None
    train_cfg: Optional[Any] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        ecfg = dict(self.bbox_roi_extractor or dict(
            roi_layer=dict(type='RoIAlign', output_size=7,
                           sampling_ratio=2),
            out_channels=256, featmap_strides=[4, 8, 16, 32]))
        ecfg.pop('type', None)
        self._extractor = build_roi_extractor(
            dict(type='SingleRoIExtractor', **ecfg))
        heads = self.bbox_head
        if isinstance(heads, dict):
            heads = [heads] * self.num_stages
        built = []
        for i, hc in enumerate(heads or [{}] * self.num_stages):
            hc = dict(hc)
            hc.pop('type', None)
            hc.setdefault('dtype', self.dtype)
            built.append(DIIHead(name=f'bbox_head{i}', **hc))
        self._bbox_heads = built
        tr = self.train_cfg
        if isinstance(tr, dict) or tr is None:
            tr = [tr] * self.num_stages
        assigners = []
        for cfg in tr:
            # reference sparse_rcnn configs use BBoxL1Cost's DEFAULT
            # box_format='xyxy' (configs/sparse_rcnn/*.py:82; the
            # match_cost docstring's "'xywh' for Sparse_RCNN" comment
            # describes an option no shipped config takes) — forcing
            # xywh here changed the Hungarian matching, caught by
            # test_grad_parity_sparse_rcnn
            acfg = dict((cfg or {}).get('assigner', dict(
                type='HungarianAssigner',
                cls_cost=dict(type='FocalLossCost', weight=2.0),
                reg_cost=dict(type='BBoxL1Cost', weight=5.0),
                iou_cost=dict(type='IoUCost', iou_mode='giou',
                              weight=2.0))))
            acfg.pop('type', None)
            assigners.append(HungarianAssigner(**acfg))
        self._assigners = assigners

    def _stage_forward(self, stage, feats, proposals, object_feats,
                       train=False):
        b, p, _ = proposals.shape
        batch_idx = jnp.repeat(jnp.arange(b, dtype=proposals.dtype), p)
        rois = jnp.concatenate(
            [batch_idx[:, None], proposals.reshape(-1, 4)], -1)
        roi_feats = self._extractor(feats, rois)
        head = self._bbox_heads[stage]
        cls_score, delta, obj = head(roi_feats, object_feats, train=train)
        new_props = head.refine_bboxes(proposals, delta)
        return cls_score, new_props, obj

    def forward_dummy(self, feats, proposals, object_feats, img_shapes):
        for stage in range(self.num_stages):
            cls_score, proposals, object_feats = self._stage_forward(
                stage, feats, jax.lax.stop_gradient(proposals),
                object_feats)
        return cls_score, proposals

    def forward_train(self, rng, feats, proposals, object_feats,
                      imgs_whwh, gt_bboxes, gt_valid,
                      gt_labels) -> Dict[str, jnp.ndarray]:
        losses: Dict[str, jnp.ndarray] = {}
        for stage in range(self.num_stages):
            # reference detaches proposals BETWEEN stages
            # (sparse_roi_head.py detach_proposal_list) but NOT into
            # stage 0 — the learnable EmbeddingRPN init boxes receive
            # gradients through the stage-0 delta decode (RoI-box grads
            # through RoIAlign itself are zero on both sides, mmcv
            # parity). Caught by test_grad_parity_sparse_rcnn.
            cls_score, new_props, object_feats = self._stage_forward(
                stage, feats, proposals, object_feats, train=True)
            sl = self._stage_loss(stage, cls_score, new_props, imgs_whwh,
                                  gt_bboxes, gt_valid, gt_labels)
            w = self.stage_loss_weights[stage]
            for k, v in sl.items():
                losses[f'stage{stage}_{k}'] = v * w
            proposals = jax.lax.stop_gradient(new_props)
        return losses

    def _stage_loss(self, stage, cls_score, proposals, imgs_whwh,
                    gt_bboxes, gt_valid, gt_labels):
        b, p, k = cls_score.shape
        assigner = self._assigners[min(stage, len(self._assigners) - 1)]

        def assign_one(cp, props, gb, gv, gl, whwh):
            norm_ccwh = bbox_xyxy_to_cxcywh(props / whwh[None, :])
            res = assigner.assign(norm_ccwh, cp, gb, gv, gl, whwh)
            return res.gt_inds, res.labels

        gt_inds, labels = jax.vmap(assign_one)(
            jax.lax.stop_gradient(cls_score),
            jax.lax.stop_gradient(proposals),
            gt_bboxes, gt_valid, gt_labels, imgs_whwh)
        pos = gt_inds > 0
        labels = jnp.where(pos, labels, self._bbox_heads[0].num_classes)
        num_pos = jnp.maximum(jnp.sum(pos).astype(jnp.float32), 1.0)
        loss_cls = self._bbox_heads[stage]._loss_cls(
            cls_score.reshape(b * p, k), labels.reshape(-1),
            avg_factor=num_pos)

        gi = jnp.clip(gt_inds - 1, 0)
        tgt = jnp.take_along_axis(gt_bboxes, gi[..., None], axis=1)
        wts = pos[..., None].astype(jnp.float32)
        whwh = jnp.broadcast_to(imgs_whwh[:, None, :], proposals.shape)
        loss_bbox = self._bbox_heads[stage]._loss_bbox(
            (proposals / whwh).reshape(-1, 4),
            (tgt / whwh).reshape(-1, 4),
            weight=wts.reshape(-1, 1), avg_factor=num_pos)
        loss_iou = self._bbox_heads[stage]._loss_iou(
            proposals.reshape(-1, 4), tgt.reshape(-1, 4),
            weight=wts.reshape(-1, 1)[..., 0], avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_iou=loss_iou)

    def simple_test(self, feats, proposals, object_feats, imgs_whwh,
                    scale_factors, rescale: bool = True):
        for stage in range(self.num_stages):
            cls_score, proposals, object_feats = self._stage_forward(
                stage, feats, proposals, object_feats)
        b, p, k = cls_score.shape
        max_per_img = dict(self.test_cfg or {}).get('max_per_img', p)
        head = self._bbox_heads[-1]
        if head.use_sigmoid_cls:
            scores = jax.nn.sigmoid(cls_score)
        else:
            scores = jax.nn.softmax(cls_score, -1)[..., :-1]
            k = k - 1

        def per_image(sc, props, sf):
            flat = sc.reshape(-1)
            top_scores, top_idx = fast_topk(flat, max_per_img)
            lbl = (top_idx % k).astype(jnp.int32)
            box = props[top_idx // k]
            if rescale:
                box = box / sf[None, :4]
            dets = jnp.concatenate([box, top_scores[:, None]], -1)
            return dets, lbl

        dets, lbls = jax.vmap(per_image)(scores, proposals,
                                         scale_factors)
        valid = jnp.ones(dets.shape[:2], bool)
        return dets, lbls, valid
