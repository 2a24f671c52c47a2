"""SABLHead — Side-Aware Boundary Localization RoI bbox head
(reference: mmdet/models/roi_heads/bbox_heads/sabl_head.py:14;
arXiv:1912.04260). Used by configs/sabl/sabl_{faster,cascade}_rcnn_*.

Two branches over the (R, 7, 7, C) RoI feature:
- cls: flatten → FCs → (num_classes+1) logits.
- reg: pre 3×3 convs → attention pooling into per-column fx (R, W, C)
  and per-row fy (R, H, C) streams → 1-D post convs → ×2 transposed-conv
  upsample to num_buckets positions → shared per-position FCs emitting a
  bucket logit and a fine offset per edge position; side_aware_split
  reorders each stream into (left-half, flipped right-half) so positions
  align with BucketingBBoxCoder's (l, r) / (t, d) target order.

All targets/losses run on the sampler's fixed slots (masked, static
shapes). ``bbox_pred`` is the tuple (bucket_cls (R, 4·side),
bucket_offset (R, 4·side)); the RoI heads reshape it with jax.tree.map.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS, build_bbox_coder, build_loss
from ..layers import ConvModule, normal_init, xavier_init
from ...core.bbox.samplers import SamplingResult
from ...core.nms import multiclass_nms
from ...models.losses import accuracy


@HEADS.register_module()
class SABLHead(nn.Module):
    num_classes: int = 80
    cls_in_channels: int = 256
    reg_in_channels: int = 256
    roi_feat_size: int = 7
    reg_feat_up_ratio: int = 2
    reg_pre_kernel: int = 3
    reg_post_kernel: int = 3
    reg_pre_num: int = 2
    reg_post_num: int = 1
    cls_out_channels: int = 1024
    reg_offset_out_channels: int = 256
    reg_cls_out_channels: int = 256
    num_cls_fcs: int = 1
    num_reg_fcs: int = 0
    reg_class_agnostic: bool = True
    norm_cfg: Optional[dict] = None
    bbox_coder: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox_cls: Optional[dict] = None
    loss_bbox_reg: Optional[dict] = None
    dtype: Any = jnp.float32

    # RoI heads key off this to route tuple bbox_preds (no reg deltas)
    with_reg: bool = True
    with_cls: bool = True

    def setup(self):
        assert self.reg_class_agnostic
        self._bbox_coder = build_bbox_coder(dict(
            self.bbox_coder or dict(type='BucketingBBoxCoder',
                                    num_buckets=14, scale_factor=1.7)))
        self.num_buckets = self._bbox_coder.num_buckets
        self.side_num = int(np.ceil(self.num_buckets / 2))
        self.up_size = self.roi_feat_size * self.reg_feat_up_ratio
        assert self.up_size == self.num_buckets
        self._loss_cls = build_loss(dict(
            self.loss_cls or dict(type='CrossEntropyLoss',
                                  use_sigmoid=False, loss_weight=1.0)))
        self._loss_bbox_cls = build_loss(dict(
            self.loss_bbox_cls or dict(type='CrossEntropyLoss',
                                       use_sigmoid=True, loss_weight=1.0)))
        self._loss_bbox_reg = build_loss(dict(
            self.loss_bbox_reg or dict(type='SmoothL1Loss', beta=0.1,
                                       loss_weight=1.0)))

        self.cls_fcs = [nn.Dense(self.cls_out_channels, dtype=self.dtype,
                                 kernel_init=xavier_init(),
                                 name=f'cls_fcs{i}')
                        for i in range(self.num_cls_fcs)]
        self.fc_cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                               kernel_init=normal_init(0.01), name='fc_cls')

        self.reg_pre_convs = [
            ConvModule(self.reg_in_channels, self.reg_pre_kernel,
                       padding=self.reg_pre_kernel // 2,
                       norm_cfg=self.norm_cfg, act_cfg=dict(type='ReLU'),
                       dtype=self.dtype, name=f'reg_pre_convs{i}')
            for i in range(self.reg_pre_num)]
        # 1-D post convs along the kept axis (reference kernels (1,k)/(k,1))
        self.reg_post_conv_xs = [
            nn.Conv(self.reg_in_channels, (self.reg_post_kernel,),
                    padding='SAME', dtype=self.dtype,
                    name=f'reg_post_conv_xs{i}')
            for i in range(self.reg_post_num)]
        self.reg_post_conv_ys = [
            nn.Conv(self.reg_in_channels, (self.reg_post_kernel,),
                    padding='SAME', dtype=self.dtype,
                    name=f'reg_post_conv_ys{i}')
            for i in range(self.reg_post_num)]
        self.reg_conv_att_x = nn.Conv(1, (1, 1), dtype=self.dtype,
                                      kernel_init=normal_init(0.01),
                                      name='reg_conv_att_x')
        self.reg_conv_att_y = nn.Conv(1, (1, 1), dtype=self.dtype,
                                      kernel_init=normal_init(0.01),
                                      name='reg_conv_att_y')
        if self.reg_feat_up_ratio > 1:
            up = self.reg_feat_up_ratio
            self.upsample_x = nn.ConvTranspose(
                self.reg_in_channels, (up,), strides=(up,),
                kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype, name='upsample_x')
            self.upsample_y = nn.ConvTranspose(
                self.reg_in_channels, (up,), strides=(up,),
                kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype, name='upsample_y')

        self.reg_cls_fcs = [
            nn.Dense(self.reg_cls_out_channels, dtype=self.dtype,
                     kernel_init=xavier_init(), name=f'reg_cls_fcs{i}')
            for i in range(self.num_reg_fcs)]
        self.reg_offset_fcs = [
            nn.Dense(self.reg_offset_out_channels, dtype=self.dtype,
                     kernel_init=xavier_init(), name=f'reg_offset_fcs{i}')
            for i in range(self.num_reg_fcs)]
        self.fc_reg_cls = nn.Dense(1, dtype=self.dtype,
                                   kernel_init=normal_init(0.01),
                                   name='fc_reg_cls')
        self.fc_reg_offset = nn.Dense(1, dtype=self.dtype,
                                      kernel_init=normal_init(0.001),
                                      name='fc_reg_offset')

    # -------------------------------------------------------------- forward
    def _attention_pool(self, x):
        """Direction-specific attention pooling (reference :214-226).
        x (R, H, W, C) → fx (R, W, C) [pool over rows], fy (R, H, C)."""
        att_x = nn.sigmoid(self.reg_conv_att_x(x))       # (R, H, W, 1)
        att_y = nn.sigmoid(self.reg_conv_att_y(x))
        att_x = att_x / jnp.sum(att_x, axis=1, keepdims=True)
        att_y = att_y / jnp.sum(att_y, axis=2, keepdims=True)
        fx = jnp.sum(x * att_x, axis=1)                  # (R, W, C)
        fy = jnp.sum(x * att_y, axis=2)                  # (R, H, C)
        return fx, fy

    def _side_split(self, f):
        """Reorder positions to (left-half, flipped right-half) so they
        align with the coder's outside-in bucket order (reference
        side_aware_split :266-276)."""
        l_end = int(np.ceil(self.up_size / 2))
        r_start = int(np.floor(self.up_size / 2))
        return jnp.concatenate(
            [f[:, :l_end], jnp.flip(f[:, r_start:], axis=1)], axis=-1)

    def _reg_pred(self, f):
        """Per-position bucket logit + fine offset (reference reg_pred
        :247-264). f (R, L, C) → (offset (R, L), cls (R, L))."""
        r, l, c = f.shape
        x = f.reshape(r * l, c)
        xo, xc = x, x
        for fc in self.reg_offset_fcs:
            xo = nn.relu(fc(xo))
        for fc in self.reg_cls_fcs:
            xc = nn.relu(fc(xc))
        off = self.fc_reg_offset(xo).reshape(r, l)
        cls = self.fc_reg_cls(xc).reshape(r, l)
        return off, cls

    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x (R, s, s, C) → (cls_score (R, C+1),
        (bucket_cls (R, 4·side), bucket_offset (R, 4·side)))."""
        # cls branch
        h = x.reshape(x.shape[0], -1)
        for fc in self.cls_fcs:
            h = nn.relu(fc(h))
        cls_score = self.fc_cls(h)

        # reg branch
        rx = x
        for conv in self.reg_pre_convs:
            rx = conv(rx, train=train)
        fx, fy = self._attention_pool(rx)
        for conv in self.reg_post_conv_xs:
            fx = nn.relu(conv(fx))
        for conv in self.reg_post_conv_ys:
            fy = nn.relu(conv(fy))
        if self.reg_feat_up_ratio > 1:
            fx = nn.relu(self.upsample_x(fx))
            fy = nn.relu(self.upsample_y(fy))
        off_x, cls_x = self._reg_pred(fx)
        off_y, cls_y = self._reg_pred(fy)
        bucket_offset = jnp.concatenate(
            [self._side_split(off_x), self._side_split(off_y)], axis=-1)
        bucket_cls = jnp.concatenate(
            [self._side_split(cls_x), self._side_split(cls_y)], axis=-1)
        return cls_score, (bucket_cls, bucket_offset)

    # -------------------------------------------------------------- targets
    def get_targets(self, samp: SamplingResult, rcnn_cfg: dict):
        """Fixed-slot bucket targets (reference bucket_target :353-414:
        labels/weights per slot; coder.encode on positives only)."""
        bg = self.num_classes
        labels = jnp.where(samp.is_pos, jnp.clip(samp.pos_gt_labels, 0), bg)
        labels = jnp.where(samp.valid, labels, bg)
        label_weights = samp.valid.astype(jnp.float32)
        offsets, offset_w, bucket_labels, cls_w = self._bbox_coder.encode(
            samp.bboxes, samp.pos_gt_bboxes)
        pos = samp.is_pos[:, None].astype(jnp.float32)
        bbox_targets = (bucket_labels * pos, offsets * pos)
        bbox_weights = (cls_w * pos, offset_w * pos)
        return labels, label_weights, bbox_targets, bbox_weights

    # ----------------------------------------------------------------- loss
    def loss(self, cls_score, bbox_pred, rois, labels, label_weights,
             bbox_targets, bbox_weights,
             reduction_override=None, **kwargs) -> Dict[str, jnp.ndarray]:
        """(reference sabl_head.py:416-473)."""
        losses = {}
        if cls_score is not None:
            avg = jnp.maximum(jnp.sum(label_weights > 0), 1.0)
            losses['loss_cls'] = self._loss_cls(
                cls_score, labels, weight=label_weights, avg_factor=avg,
                reduction_override=reduction_override)
            losses['acc'] = accuracy(cls_score, labels, mask=label_weights)
        if bbox_pred is not None:
            bucket_cls_preds, bucket_offset_preds = bbox_pred
            bucket_cls_targets, bucket_offset_targets = bbox_targets
            bucket_cls_weights, bucket_offset_weights = bbox_weights
            s = self.side_num
            # reference avg_factor counts ACTUAL sampled rois
            # (bucket_*_targets.size(0)); in the padded layout that is
            # the number of valid slots, not the static capacity
            n_valid = jnp.maximum(
                jnp.sum((label_weights > 0).astype(jnp.float32)), 1.0)
            losses['loss_bbox_cls'] = self._loss_bbox_cls(
                bucket_cls_preds.reshape(-1, s),
                bucket_cls_targets.reshape(-1, s),
                weight=bucket_cls_weights.reshape(-1, s),
                avg_factor=n_valid * (bucket_cls_targets.shape[-1] // s),
                reduction_override=reduction_override)
            losses['loss_bbox_reg'] = self._loss_bbox_reg(
                bucket_offset_preds, bucket_offset_targets,
                weight=bucket_offset_weights,
                avg_factor=n_valid,
                reduction_override=reduction_override)
        return losses

    # ---------------------------------------------------------------- boxes
    def decode_for_test(self, rois, bbox_pred, img_shape):
        """(boxes, score_factors) for the generic RoI-head test paths."""
        boxes, confids = self._bbox_coder.decode(rois[..., -4:], bbox_pred,
                                                 max_shape=img_shape)
        return boxes, confids

    def get_bboxes(self, rois, cls_score, bbox_pred, img_shape, scale_factor,
                   rescale: bool, cfg: Optional[dict], roi_valid=None):
        """Decode + bucketing-guided rescored NMS (reference :464-505:
        multiclass_nms(score_factors=confids))."""
        scores = jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)
        boxes, confids = self._bbox_coder.decode(rois[:, 1:], bbox_pred,
                                                 max_shape=img_shape)
        if rescale:
            boxes = boxes / scale_factor[None, :4]
        if roi_valid is not None:
            scores = jnp.where(roi_valid[:, None], scores, 0.0)
        return multiclass_nms(boxes, scores, cfg['score_thr'],
                              dict(cfg['nms']), cfg['max_per_img'],
                              score_factors=confids)

    def regress_by_class(self, rois, labels, bbox_pred, img_shape):
        """Cascade refinement glue — class-agnostic, labels unused
        (reference :547-572)."""
        new, _ = self._bbox_coder.decode(rois[..., -4:], bbox_pred,
                                         max_shape=img_shape)
        if rois.shape[-1] == 5:
            new = jnp.concatenate([rois[:, :1], new], axis=-1)
        return new
