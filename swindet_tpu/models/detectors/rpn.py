"""RPN-only detector (reference: mmdet/models/detectors/rpn.py:12) —
trains the RPN alone; simple_test returns proposals as class-agnostic
detections (evaluated with proposal recall / 'proposal_fast')."""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import flax.linen as nn

from ..builder import DETECTORS, build_backbone, build_head, build_neck


@DETECTORS.register_module()
class RPN(nn.Module):
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    rpn_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        def _wd(cfg):
            out = dict(cfg)
            out.setdefault('dtype', self.dtype)
            return out
        self._backbone = build_backbone(_wd(self.backbone))
        self._neck = build_neck(_wd(self.neck)) if self.neck else None
        rpn_train = dict(self.train_cfg or {}).get('rpn',
                                                   self.train_cfg)
        self._rpn_head = build_head(_wd(dict(
            self.rpn_head, train_cfg=rpn_train,
            test_cfg=dict(self.test_cfg or {}).get('rpn',
                                                   self.test_cfg))))

    def extract_feat(self, img, train: bool = False):
        x = self._backbone(img, train=train)
        if self._neck is not None:
            x = self._neck(x, train=train)
        return x

    def __call__(self, img, train: bool = False):
        return self.extract_feat(img, train=train)

    def forward_dummy(self, img, num_rois: int = 100):
        return self._rpn_head(self.extract_feat(img))

    def forward_train(self, img, img_shapes, pad_shapes, gt_bboxes,
                      gt_valid, gt_labels, gt_masks=None):
        feats = self.extract_feat(img, train=True)
        rng = self.make_rng('sampling')
        outs = self._rpn_head(feats, train=True)
        return self._rpn_head.loss(rng, *outs, gt_bboxes, gt_valid,
                                   None, img_shapes, pad_shapes)

    def simple_test(self, img, img_shapes, scale_factors,
                    rescale: bool = True) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(img)
        outs = self._rpn_head(feats)
        cfg = dict(self.test_cfg or {})
        props, scores, valid = self._rpn_head.get_proposals(
            *outs, img_shapes, dict(cfg.get('rpn', cfg)))
        if rescale:
            props = props / scale_factors[:, None, :4]
        dets = jnp.concatenate([props, scores[..., None]], -1)
        labels = jnp.zeros(scores.shape, jnp.int32)
        return dict(dets=dets, labels=labels, det_valid=valid)
