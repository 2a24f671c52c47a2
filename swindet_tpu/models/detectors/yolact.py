"""YOLACT detector (reference: mmdet/models/detectors/yolact.py:9) —
single-stage + protonet instance masks + train-only semantic head."""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..builder import DETECTORS, build_head
from ..dense_heads.yolact_head import crop_by_boxes
from .single_stage import SingleStageDetector

EPS = 1e-6


@DETECTORS.register_module()
class YOLACT(SingleStageDetector):
    segm_head: Optional[dict] = None
    mask_head: Optional[dict] = None

    def setup(self):
        super().setup()
        self._segm_head = build_head(self._with_dtype(dict(
            self.segm_head or dict(type='YOLACTSegmHead'))))
        self._mask_head = build_head(self._with_dtype(dict(
            self.mask_head or dict(type='YOLACTProtonet'))))

    def forward_dummy(self, img, num_rois: int = 100):
        feats = self.extract_feat(img)
        outs = self._bbox_head(feats)
        return outs, self._segm_head(feats[0]), self._mask_head(feats[0])

    def forward_train(self, img, img_shapes, pad_shapes, gt_bboxes,
                      gt_valid, gt_labels,
                      gt_masks=None) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(img, train=True)
        rng = self.make_rng('sampling')
        cls_scores, bbox_preds, coeff_preds = self._bbox_head(
            feats, train=True)
        losses, aux = self._bbox_head.loss_with_aux(
            rng, cls_scores, bbox_preds, gt_bboxes, gt_valid, gt_labels,
            img_shapes, pad_shapes)

        segm_pred = self._segm_head(feats[0])
        losses.update(self._segm_head.loss(segm_pred, gt_masks,
                                           gt_valid, gt_labels))

        # protonet mask loss on ≤max_masks_to_train random positives
        proto = self._mask_head(feats[0], train=True)      # (B,Hp,Wp,P)
        b, hp, wp, np_ = proto.shape
        m = self._mask_head.max_masks_to_train
        coeff_flat = jnp.concatenate([
            c.astype(jnp.float32).reshape(b, -1,
                                          self._bbox_head.num_protos)
            for c in coeff_preds], 1)
        pos, pos_gt = aux['pos'], aux['pos_gt']
        sel_rng = self.make_rng('sampling')
        keys = jax.random.uniform(sel_rng, pos.shape)
        sel_score = jnp.where(pos, keys, -1.0)
        _, sel_idx = jax.lax.top_k(sel_score, m)            # (B, m)
        sel_valid = jnp.take_along_axis(pos, sel_idx, 1)
        sel_gt = jnp.take_along_axis(pos_gt, sel_idx, 1)    # (B, m)
        sel_coeff = jnp.take_along_axis(
            coeff_flat, sel_idx[..., None], 1)              # (B, m, P)

        def per_image(proto_i, coeff_i, gt_box, gmask, sgt, sval, ish):
            mask = jax.nn.sigmoid(
                jnp.einsum('hwp,mp->mhw', proto_i.astype(jnp.float32),
                           coeff_i))
            box = jnp.take(gt_box, sgt, axis=0)             # (m, 4)
            hW = ish.astype(jnp.float32)
            rel = box / jnp.stack([hW[1], hW[0], hW[1], hW[0]])[None]
            mask = crop_by_boxes(mask, rel)
            tgt = jax.image.resize(gmask.astype(jnp.float32),
                                   (gmask.shape[0], hp, wp), 'bilinear')
            tgt = (tgt > 0.5).astype(jnp.float32)
            tgt = jnp.take(tgt, sgt, axis=0)
            p = jnp.clip(mask, EPS, 1 - EPS)
            bce = -(tgt * jnp.log(p) + (1 - tgt) * jnp.log(1 - p))
            bw = jnp.maximum((box[:, 2] - box[:, 0]) / hW[1], EPS)
            bh = jnp.maximum((box[:, 3] - box[:, 1]) / hW[0], EPS)
            per = bce.mean(axis=(1, 2)) / bw / bh
            return jnp.sum(jnp.where(sval, per, 0.0))

        lm = jax.vmap(per_image)(proto, sel_coeff, gt_bboxes, gt_masks,
                                 sel_gt, sel_valid, img_shapes)
        total_pos = jnp.maximum(
            jnp.sum(sel_valid).astype(jnp.float32), 1.0)
        losses['loss_mask'] = (self._mask_head.loss_mask_weight *
                               jnp.sum(lm) / total_pos)
        return losses

    def simple_test(self, img, img_shapes, scale_factors,
                    rescale: bool = True) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(img)
        cls_scores, bbox_preds, coeff_preds = self._bbox_head(feats)
        res = self._bbox_head.get_bboxes(
            cls_scores, bbox_preds, coeff_preds, img_shapes,
            scale_factors, cfg=dict(self.test_cfg), rescale=rescale)
        proto = self._mask_head(feats[0])

        def per_image(proto_i, coeffs, dets, ish, sf):
            # reference YOLACTProtonet.forward (test branch, :660):
            # sigmoid(proto @ coeff.T), crop by boxes made relative to
            # img_shape, keep PROTO resolution; get_seg_masks (:828)
            # bilinear-upsamples the full map to ori shape on the host.
            mask = jax.nn.sigmoid(
                jnp.einsum('hwp,mp->mhw', proto_i.astype(jnp.float32),
                           coeffs))
            boxes = dets[:, :4]
            if rescale:  # back to input frame for proto cropping
                boxes = boxes * sf[None, :4]
            hw = ish.astype(jnp.float32)
            rel = boxes / jnp.stack([hw[1], hw[0], hw[1], hw[0]])[None]
            return crop_by_boxes(mask, rel)

        probs = jax.vmap(per_image)(proto, res.coeffs, res.dets,
                                    img_shapes, scale_factors)
        return dict(dets=res.dets, labels=res.labels,
                    det_valid=res.valid, mask_probs_full=probs)
