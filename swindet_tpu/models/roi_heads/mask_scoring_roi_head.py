"""Mask Scoring R-CNN (reference: mmdet/models/roi_heads/
mask_scoring_roi_head.py:9 + mask_heads/maskiou_head.py:12,
arXiv:1903.00241): a MaskIoU head predicts the IoU of each predicted
mask with its gt; at test time mask_score = cls_score * mask_iou.

Static-shape port: the gt-area-inside-proposal ratio (the reference's
host loop over mask crops) is computed on-device with per-gt
summed-area tables — 4 gathers per positive instead of a crop.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS, build_head, build_loss
from .standard_roi_head import StandardRoIHead


@HEADS.register_module()
class MaskIoUHead(nn.Module):
    """(reference: maskiou_head.py:12)."""
    num_convs: int = 4
    num_fcs: int = 2
    roi_feat_size: int = 14
    in_channels: int = 256
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    num_classes: int = 80
    loss_iou: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        self._loss_iou = build_loss(dict(
            self.loss_iou or dict(type='MSELoss', loss_weight=0.5)))
        self.convs = [
            nn.Conv(self.conv_out_channels, (3, 3),
                    strides=2 if i == self.num_convs - 1 else 1,
                    padding=[(1, 1)] * 2, dtype=self.dtype,
                    name=f'convs{i}')
            for i in range(self.num_convs)]
        self.fcs = [
            nn.Dense(self.fc_out_channels, dtype=self.dtype,
                     name=f'fcs{i}') for i in range(self.num_fcs)]
        self.fc_mask_iou = nn.Dense(self.num_classes, dtype=self.dtype,
                                    name='fc_mask_iou')

    def __call__(self, mask_feat, mask_pred, train: bool = False):
        """mask_feat (M, 14, 14, C); mask_pred (M, 28, 28) own-class
        logits → per-class iou predictions (M, num_classes)."""
        p = jax.nn.sigmoid(mask_pred.astype(jnp.float32))[..., None]
        p = nn.max_pool(p, (2, 2), strides=(2, 2))     # 28 → 14
        x = jnp.concatenate([mask_feat,
                             p.astype(mask_feat.dtype)], axis=-1)
        for conv in self.convs:
            x = nn.relu(conv(x))
        x = x.reshape(x.shape[0], -1)
        for fc in self.fcs:
            x = nn.relu(fc(x))
        return self.fc_mask_iou(x)

    @staticmethod
    def area_ratio(gt_masks, pos_boxes, pos_gt_inds):
        """Per-positive ratio gt-area-inside-box / full gt area for ONE
        image via summed-area tables (reference :151 _get_area_ratio)."""
        g, hh, ww = gt_masks.shape
        m = gt_masks.astype(jnp.float32)
        sat = jnp.pad(jnp.cumsum(jnp.cumsum(m, 1), 2),
                      ((0, 0), (1, 0), (1, 0)))        # (G, H+1, W+1)
        full = m.sum((1, 2))                            # (G,)

        def one(box, gi):
            # BitmapMasks.crop (structures.py:309): int-truncated box,
            # EXCLUSIVE x2/y2, width/height floored at 1
            x1 = jnp.clip(box[0].astype(jnp.int32), 0, ww)
            y1 = jnp.clip(box[1].astype(jnp.int32), 0, hh)
            x2 = jnp.clip(jnp.maximum(box[2].astype(jnp.int32), x1 + 1),
                          0, ww)
            y2 = jnp.clip(jnp.maximum(box[3].astype(jnp.int32), y1 + 1),
                          0, hh)
            s = sat[gi]
            inside = s[y2, x2] - s[y1, x2] - s[y2, x1] + s[y1, x1]
            return inside / (full[gi] + 1e-7)

        return jax.vmap(one)(pos_boxes, pos_gt_inds)

    def get_targets(self, area_ratios, mask_pred, mask_targets,
                    mask_thr_binary: float = 0.5):
        """(reference :101): IoU of binarized prediction vs the full gt
        instance (gt full area recovered via the area ratio)."""
        # the reference binarizes the RAW LOGITS at mask_thr_binary
        # (maskiou_head.py:137 — no sigmoid; 0.5 on logits ~ p>0.62)
        pred_bin = (mask_pred.astype(jnp.float32)
                    > mask_thr_binary).astype(jnp.float32)
        pred_area = pred_bin.sum((-1, -2))
        overlap = (pred_bin * mask_targets).sum((-1, -2))
        gt_full = mask_targets.sum((-1, -2)) / (area_ratios + 1e-7)
        return overlap / jnp.maximum(
            pred_area + gt_full - overlap, 1e-7)

    def loss(self, pos_iou_pred, iou_targets, pos_mask):
        valid = (iou_targets > 0) & (pos_mask > 0)
        l = self._loss_iou(pos_iou_pred, iou_targets,
                           weight=valid.astype(jnp.float32),
                           avg_factor=jnp.maximum(jnp.sum(valid), 1.0))
        return dict(loss_mask_iou=l)


@HEADS.register_module()
class MaskScoringRoIHead(StandardRoIHead):
    mask_iou_head: Optional[dict] = None

    def setup(self):
        super().setup()
        assert self.mask_iou_head is not None
        self._mask_iou_head = build_head(dict(
            self.mask_iou_head, dtype=self.dtype,
            name='_mask_iou_head'))

    def forward_dummy(self, feats, num_rois: int = 100):
        outs = super().forward_dummy(feats, num_rois)
        # touch the iou-head params (init path)
        rois = jnp.concatenate([
            jnp.zeros((num_rois, 1)),
            jnp.tile(np.asarray([[0., 0., 32., 32.]], np.float32),
                     (num_rois, 1))], axis=-1)
        mask_feats = self._mask_extractor(feats, rois)
        mask_pred = outs[-1]
        own = mask_pred[..., 0]
        outs += (self._mask_iou_head(mask_feats, own),)
        return outs

    def forward_train(self, rng, feats, proposals, proposal_valid,
                      gt_bboxes, gt_valid, gt_labels, gt_masks,
                      img_shapes) -> Dict[str, jnp.ndarray]:
        """Standard RoI training + the mask-iou branch (reference:
        mask_scoring_roi_head.py:30 _mask_forward_train)."""
        losses, aux = self._forward_train_impl(
            rng, feats, proposals, proposal_valid, gt_bboxes, gt_valid,
            gt_labels, gt_masks, img_shapes, return_mask_aux=True)
        if aux is None:
            return losses
        (mask_feats, mask_pred, targets, pos_boxes, pos_inds, pos_mask,
         pos_labels) = aux
        b, m = pos_boxes.shape[:2]
        safe = jnp.clip(pos_labels.reshape(-1), 0,
                        self._mask_iou_head.num_classes - 1)
        own_pred = jnp.take_along_axis(
            mask_pred, safe[:, None, None, None], axis=-1)[..., 0]
        iou_pred = self._mask_iou_head(mask_feats, own_pred, train=True)
        pos_iou_pred = jnp.take_along_axis(
            iou_pred.astype(jnp.float32), safe[:, None], axis=-1)[:, 0]
        ratios = jax.vmap(self._mask_iou_head.area_ratio)(
            gt_masks, pos_boxes, pos_inds).reshape(-1)
        iou_t = self._mask_iou_head.get_targets(
            ratios, own_pred,
            targets.reshape(own_pred.shape),
            dict(self.train_cfg).get('mask_thr_binary', 0.5))
        losses.update(self._mask_iou_head.loss(
            pos_iou_pred, iou_t,
            pos_mask.reshape(-1).astype(jnp.float32)))
        return losses

    def simple_test(self, feats, proposals, proposal_valid, img_shapes,
                    scale_factors, rescale: bool = True):
        out = super().simple_test(feats, proposals, proposal_valid,
                                  img_shapes, scale_factors,
                                  rescale=rescale)
        if 'mask_probs' in out:
            # mask_score = cls_score * own-class mask iou (reference
            # maskiou_head.py:177 get_mask_scores)
            b, m = out['labels'].shape
            det_boxes = out['dets'][..., :4]
            if rescale:
                det_boxes = det_boxes * scale_factors[:, None, :4]
            mask_rois = jnp.concatenate(
                [jnp.repeat(np.arange(b, dtype=np.float32), m)[:, None],
                 det_boxes.reshape(-1, 4)], axis=-1)
            mask_feats = self._mask_extractor(feats, mask_rois)
            mask_pred = self._mask_head(mask_feats)
            flat_labels = out['labels'].reshape(-1)
            own = self._mask_head.get_mask_probs(mask_pred, flat_labels)
            own_logits = jnp.log(jnp.clip(own, 1e-7, 1 - 1e-7))
            iou_pred = self._mask_iou_head(mask_feats, own_logits)
            safe = jnp.clip(flat_labels, 0,
                            self._mask_iou_head.num_classes - 1)
            iou_own = jnp.take_along_axis(
                jax.nn.relu(iou_pred.astype(jnp.float32)),
                safe[:, None], axis=-1)[:, 0]
            out['mask_scores'] = (
                out['dets'][..., 4].reshape(-1) * iou_own).reshape(b, m)
        return out
