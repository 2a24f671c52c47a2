"""BBox heads (reference: mmdet/models/roi_heads/bbox_heads/bbox_head.py:13,
convfc_bbox_head.py:9,177,193).

ConvFCBBoxHead: shared convs → shared fcs → separate cls/reg branches.
Targets/losses/decode are batched static-shape methods over the sampler's
fixed slots.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS, build_bbox_coder, build_loss
from ..layers import ConvModule
from ...core.bbox.samplers import SamplingResult
from ...core.nms import multiclass_nms
from ...models.losses import accuracy


@HEADS.register_module()
class ConvFCBBoxHead(nn.Module):
    """Configurable conv/fc box head."""
    num_shared_convs: int = 0
    num_shared_fcs: int = 0
    num_cls_convs: int = 0
    num_cls_fcs: int = 0
    num_reg_convs: int = 0
    num_reg_fcs: int = 0
    with_avg_pool: bool = False
    with_cls: bool = True
    with_reg: bool = True
    roi_feat_size: int = 7
    in_channels: int = 256
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    num_classes: int = 80
    bbox_coder: Optional[dict] = None
    reg_class_agnostic: bool = False
    reg_decoded_bbox: bool = False
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        self._bbox_coder = build_bbox_coder(dict(
            self.bbox_coder or dict(type='DeltaXYWHBBoxCoder',
                                    target_means=[0., 0., 0., 0.],
                                    target_stds=[0.1, 0.1, 0.2, 0.2])))
        self._loss_cls = build_loss(dict(
            self.loss_cls or dict(type='CrossEntropyLoss',
                                  use_sigmoid=False, loss_weight=1.0)))
        self._loss_bbox = build_loss(dict(
            self.loss_bbox or dict(type='L1Loss', loss_weight=1.0)))
        self.shared_convs = [
            ConvModule(self.conv_out_channels, 3, padding=1,
                       conv_cfg=self.conv_cfg,
                       norm_cfg=self.norm_cfg,
                       act_cfg=dict(type='ReLU'), dtype=self.dtype,
                       name=f'shared_convs{i}')
            for i in range(self.num_shared_convs)]
        # reference convfc_bbox_head.py init_weights: shared fcs xavier,
        # fc_cls normal(0.01), fc_reg normal(0.001)
        from ..layers import normal_init, xavier_init
        self.shared_fcs = [
            nn.Dense(self.fc_out_channels, dtype=self.dtype,
                     kernel_init=xavier_init(), name=f'shared_fcs{i}')
            for i in range(self.num_shared_fcs)]
        if self.with_cls:
            self.fc_cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                                   kernel_init=normal_init(0.01),
                                   name='fc_cls')
        if self.with_reg:
            out_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
            self.fc_reg = nn.Dense(out_dim, dtype=self.dtype,
                                   kernel_init=normal_init(0.001),
                                   name='fc_reg')

    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x: (R, s, s, C) roi features → (cls (R, C+1), reg (R, 4k))."""
        for conv in self.shared_convs:
            x = conv(x, train=train)
        if self.with_avg_pool:
            x = jnp.mean(x, axis=(1, 2))
        x = x.reshape(x.shape[0], -1)
        for fc in self.shared_fcs:
            x = nn.relu(fc(x))
        cls_score = self.fc_cls(x) if self.with_cls else None
        bbox_pred = self.fc_reg(x) if self.with_reg else None
        return cls_score, bbox_pred

    # ------------------------------------------------------------- targets
    def get_targets(self, samp: SamplingResult, rcnn_cfg: dict):
        """Per-image slot targets (reference: bbox_head.py:151).

        Returns labels, label_weights, bbox_targets, bbox_weights on the
        sampler's fixed (num,) slots.
        """
        bg = self.num_classes
        labels = jnp.where(samp.is_pos, jnp.clip(samp.pos_gt_labels, 0), bg)
        labels = jnp.where(samp.valid, labels, bg)
        pos_weight = rcnn_cfg.get('pos_weight', -1)
        pw = 1.0 if pos_weight <= 0 else float(pos_weight)
        label_weights = jnp.where(samp.is_pos, pw, 1.0) * samp.valid
        if self.reg_decoded_bbox:
            bt = samp.pos_gt_bboxes
        else:
            bt = self._bbox_coder.encode(samp.bboxes, samp.pos_gt_bboxes)
        bbox_targets = jnp.where(samp.is_pos[:, None], bt, 0.0)
        bbox_weights = jnp.where(samp.is_pos[:, None], 1.0, 0.0)
        return labels, label_weights, bbox_targets, bbox_weights

    # ---------------------------------------------------------------- loss
    def loss(self, cls_score, bbox_pred, rois, labels, label_weights,
             bbox_targets, bbox_weights,
             reduction_override=None,
             loss_bbox_kwargs=None) -> Dict[str, jnp.ndarray]:
        """(reference: bbox_head.py:219). All args flattened (B*num, ...)."""
        losses = {}
        # reference bbox_head.py:232: avg_factor = COUNT of nonzero
        # label weights, not their sum — identical for 0/1 weights but
        # not under ISR/HLR reweighting (caught by the PISA grad oracle)
        avg = jnp.maximum(
            jnp.sum((label_weights > 0).astype(jnp.float32)), 1.0)
        if cls_score is not None:
            losses['loss_cls'] = self._loss_cls(
                cls_score, labels, weight=label_weights, avg_factor=avg,
                reduction_override=reduction_override)
            losses['acc'] = accuracy(cls_score, labels, mask=label_weights)
        if bbox_pred is not None:
            pos = bbox_weights[:, 0] > 0
            if self.reg_decoded_bbox:
                pred = self._bbox_coder.decode(rois[:, 1:], bbox_pred)
            else:
                pred = bbox_pred
            if not self.reg_class_agnostic:
                k = pred.shape[-1] // 4
                pred = pred.reshape(-1, k, 4)
                safe = jnp.clip(labels, 0, k - 1)
                pred = jnp.take_along_axis(
                    pred, safe[:, None, None].repeat(4, -1), axis=1)[:, 0]
            # reference avg_factor = bbox_targets.size(0) = number of
            # ACTUALLY sampled rois. In the padded layout that is the
            # count of valid slots (label_weights > 0), NOT the static
            # capacity — they differ when the sampler isn't saturated.
            n_valid = jnp.maximum(
                jnp.sum((label_weights > 0).astype(jnp.float32)), 1.0)
            losses['loss_bbox'] = self._loss_bbox(
                pred, bbox_targets, weight=bbox_weights,
                avg_factor=n_valid,
                reduction_override=reduction_override,
                **(loss_bbox_kwargs or {}))
        return losses

    # --------------------------------------------------------------- boxes
    def get_bboxes(self, rois, cls_score, bbox_pred, img_shape, scale_factor,
                   rescale: bool, cfg: Optional[dict], roi_valid=None):
        """Per-image decode + NMS (reference: bbox_head.py:270).
        rois: (R, 5). Returns MulticlassNMSResult (padded)."""
        scores = jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)
        if bbox_pred is not None:
            boxes = self._bbox_coder.decode(rois[:, 1:], bbox_pred,
                                            max_shape=img_shape)
        else:
            k = scores.shape[-1] - 1
            boxes = jnp.tile(rois[:, 1:], (1, 1))
        if rescale:
            boxes = (boxes.reshape(boxes.shape[0], -1, 4) /
                     scale_factor[None, None, :4]).reshape(boxes.shape)
        if roi_valid is not None:
            scores = jnp.where(roi_valid[:, None], scores, 0.0)
        return multiclass_nms(boxes, scores, cfg['score_thr'],
                              dict(cfg['nms']), cfg['max_per_img'])

    def decode_for_test(self, rois, bbox_pred, img_shape):
        """(boxes, score_factors) for the generic RoI-head test paths —
        delta heads have no score factor (SABL overrides)."""
        boxes = self._bbox_coder.decode(rois[..., -4:], bbox_pred,
                                        max_shape=img_shape)
        return boxes, None

    def regress_by_class(self, rois, labels, bbox_pred, img_shape):
        """Refine rois with the predicted class's deltas — cascade glue
        (reference: bbox_head.py:455)."""
        if not self.reg_class_agnostic:
            k = bbox_pred.shape[-1] // 4
            bp = bbox_pred.reshape(-1, k, 4)
            safe = jnp.clip(labels, 0, k - 1)
            bbox_pred = jnp.take_along_axis(
                bp, safe[:, None, None].repeat(4, -1), axis=1)[:, 0]
        new = self._bbox_coder.decode(rois[..., -4:], bbox_pred,
                                      max_shape=img_shape)
        if rois.shape[-1] == 5:
            new = jnp.concatenate([rois[:, :1], new], axis=-1)
        return new


@HEADS.register_module()
class Shared2FCBBoxHead(ConvFCBBoxHead):
    """(reference: convfc_bbox_head.py:177)."""
    num_shared_convs: int = 0
    num_shared_fcs: int = 2


@HEADS.register_module()
class Shared4Conv1FCBBoxHead(ConvFCBBoxHead):
    """(reference: convfc_bbox_head.py:193) — cascade Swin configs use this
    with SyncBN norm_cfg + GIoU loss."""
    num_shared_convs: int = 4
    num_shared_fcs: int = 1


@HEADS.register_module()
class BBoxHead(ConvFCBBoxHead):
    """Plain avg-pool + linear head (reference: bbox_head.py:13)."""
    with_avg_pool: bool = True
    num_shared_convs: int = 0
    num_shared_fcs: int = 0
