"""Sparse R-CNN detector (reference:
mmdet/models/detectors/sparse_rcnn.py:8) — learned-proposal two-stage
dispatch: EmbeddingRPN decodes (B, P, 4) whole-image proposals, the
SparseRoIHead iteratively refines them.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import flax.linen as nn

from ..builder import DETECTORS, build_backbone, build_head, build_neck


@DETECTORS.register_module()
class SparseRCNN(nn.Module):
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    rpn_head: Optional[dict] = None
    roi_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        def with_dtype(cfg):
            out = dict(cfg)
            out.setdefault('dtype', self.dtype)
            return out

        self._backbone = build_backbone(with_dtype(self.backbone))
        self._neck = build_neck(with_dtype(self.neck)) \
            if self.neck is not None else None
        self._rpn_head = build_head(with_dtype(self.rpn_head))
        tr = (self.train_cfg or {}).get('rcnn')
        te = (self.test_cfg or {}).get('rcnn')
        self._roi_head = build_head(with_dtype(dict(
            self.roi_head, train_cfg=tr, test_cfg=te)))

    def extract_feat(self, img, train: bool = False):
        x = self._backbone(img, train=train)
        if self._neck is not None:
            x = self._neck(x, train=train)
        return x

    def __call__(self, img, train: bool = False):
        return self.extract_feat(img, train=train)

    def forward_dummy(self, img, num_rois: int = 100):
        feats = self.extract_feat(img)
        b, h, w = img.shape[0], img.shape[1], img.shape[2]
        shapes = jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1))
        proposals, obj_feats, imgs_whwh = self._rpn_head(shapes)
        return self._roi_head.forward_dummy(feats, proposals, obj_feats,
                                            shapes)

    def forward_train(self, img, img_shapes, pad_shapes, gt_bboxes,
                      gt_valid, gt_labels,
                      gt_masks=None) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(img, train=True)
        rng = self.make_rng('sampling')
        proposals, obj_feats, imgs_whwh = self._rpn_head(img_shapes)
        return self._roi_head.forward_train(
            rng, feats, proposals, obj_feats, imgs_whwh, gt_bboxes,
            gt_valid, gt_labels)

    def simple_test(self, img, img_shapes, scale_factors,
                    rescale: bool = True):
        feats = self.extract_feat(img)
        proposals, obj_feats, imgs_whwh = self._rpn_head(img_shapes)
        dets, labels, valid = self._roi_head.simple_test(
            feats, proposals, obj_feats, imgs_whwh, scale_factors,
            rescale=rescale)
        return dict(dets=dets, labels=labels, det_valid=valid)
