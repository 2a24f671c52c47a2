"""DETR detector (reference: mmdet/models/detectors/detr.py:8) —
single-stage dispatch whose head consumes ``img_shapes`` to build the
transformer padding mask.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..builder import DETECTORS
from .single_stage import SingleStageDetector


@DETECTORS.register_module()
class DETR(SingleStageDetector):

    def forward_dummy(self, img, num_rois: int = 100):
        feats = self.extract_feat(img)
        b, h, w = img.shape[0], img.shape[1], img.shape[2]
        shapes = jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1))
        return self._bbox_head(feats, shapes)

    def forward_train(self, img, img_shapes, pad_shapes, gt_bboxes,
                      gt_valid, gt_labels, gt_masks=None):
        feats = self.extract_feat(img, train=True)
        rng = self.make_rng('sampling')
        all_cls, all_bbox = self._bbox_head(feats, img_shapes, train=True)
        return self._bbox_head.loss(rng, all_cls, all_bbox, gt_bboxes,
                                    gt_valid, gt_labels, img_shapes,
                                    pad_shapes)

    def simple_test(self, img, img_shapes, scale_factors,
                    rescale: bool = True):
        feats = self.extract_feat(img)
        all_cls, all_bbox = self._bbox_head(feats, img_shapes)
        dets, labels, valid = self._bbox_head.get_bboxes(
            all_cls, all_bbox, img_shapes, scale_factors,
            cfg=dict(self.test_cfg or {}), rescale=rescale)
        return dict(dets=dets, labels=labels, det_valid=valid)
