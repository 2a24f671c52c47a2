"""Two-stage detector (reference: mmdet/models/detectors/two_stage.py:10,
base.py:16) + one-line subclasses (mask_rcnn.py:6, faster_rcnn.py).

The detector is a pure flax module: ``forward_train`` returns the loss
dict (the engine handles pmean/log aggregation — the reference's
_parse_losses/train_step live in engine/), ``simple_test`` returns padded
detections. Everything is batched + static-shape; rng for the samplers
flows through flax's 'sampling' rng collection.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import (DETECTORS, build_backbone, build_head, build_neck)


@DETECTORS.register_module()
class TwoStageDetector(nn.Module):
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    rpn_head: Optional[dict] = None
    roi_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    dtype: Any = jnp.float32

    def _with_dtype(self, cfg: dict) -> dict:
        """Component dtype: explicit per-component setting wins over the
        detector-level policy (a sub-dict 'dtype' was previously
        clobbered, silently forcing fp32)."""
        out = dict(cfg)
        out.setdefault('dtype', self.dtype)
        return out

    def setup(self):
        self._backbone = build_backbone(self._with_dtype(self.backbone))
        if self.neck is not None:
            # list → chained necks (e.g. Libra's FPN + BFP)
            if isinstance(self.neck, (list, tuple)):
                self._neck = [build_neck(self._with_dtype(dict(
                    n, name=f'_neck{i}')))
                    for i, n in enumerate(self.neck)]
            else:
                self._neck = build_neck(self._with_dtype(self.neck))
        if self.rpn_head is not None:
            train_cfg = dict(self.train_cfg)['rpn'] if self.train_cfg \
                else None
            self._rpn_head = build_head(self._with_dtype(dict(
                self.rpn_head, train_cfg=train_cfg,
                test_cfg=dict(self.test_cfg)['rpn'])))
        if self.roi_head is not None:
            rcnn_train = dict(self.train_cfg)['rcnn'] if self.train_cfg \
                else None
            self._roi_head = build_head(self._with_dtype(dict(
                self.roi_head, train_cfg=rcnn_train,
                test_cfg=dict(self.test_cfg)['rcnn'])))

    @property
    def with_mask(self):
        return (self.roi_head is not None
                and self.roi_head.get('mask_head') is not None)

    def extract_feat(self, img: jnp.ndarray, train: bool = False):
        """backbone → neck (reference: two_stage.py:80). img: NHWC."""
        x = self._backbone(img, train=train)
        if self.neck is not None:
            x = self._neck(x, train=train)
        return x

    def __call__(self, img: jnp.ndarray, train: bool = False):
        """Default apply = feature extraction (used for init + flops)."""
        return self.extract_feat(img, train=train)

    def forward_dummy(self, img: jnp.ndarray, num_rois: int = 100):
        """Touch every parameter once — used for init and FLOPs counting
        (reference: two_stage.py forward_dummy)."""
        feats = self.extract_feat(img)
        outs = ()
        if self.rpn_head is not None:
            outs += self._rpn_head(feats)
        if self.roi_head is not None:
            outs += self._roi_head.forward_dummy(feats, num_rois)
        return outs


    # ---------------------------------------------------------------- train
    def forward_train(self, img, img_shapes, pad_shapes, gt_bboxes,
                      gt_valid, gt_labels, gt_masks=None,
                      gt_semantic_seg=None) -> Dict[str, jnp.ndarray]:
        """(reference: two_stage.py:105). Shapes:
        img (B,H,W,3) · img/pad_shapes (B,2) · gt_bboxes (B,G,4) ·
        gt_valid (B,G) · gt_labels (B,G) · gt_masks (B,G,H,W)|None."""
        feats = self.extract_feat(img, train=True)
        losses = {}

        rpn_rng = self.make_rng('sampling')
        rcnn_rng = self.make_rng('sampling')

        rpn_outs = self._rpn_head(feats, train=True)
        losses.update(self._rpn_head.loss(
            rpn_rng, *rpn_outs, gt_bboxes, gt_valid, None,
            img_shapes, pad_shapes))

        proposal_cfg = dict(self.train_cfg).get(
            'rpn_proposal', dict(self.test_cfg)['rpn'])
        prop_kwargs = ({'use_loc_filter': False}
                       if getattr(self._rpn_head, 'HAS_LOC_FILTER', False)
                       else {})
        proposals, _, prop_valid = self._rpn_head.get_proposals(
            *rpn_outs, img_shapes, dict(proposal_cfg), **prop_kwargs)
        proposals = jax.lax.stop_gradient(proposals)

        roi_kwargs = {}
        if gt_semantic_seg is not None:
            roi_kwargs['gt_semantic_seg'] = gt_semantic_seg
        losses.update(self._roi_head.forward_train(
            rcnn_rng, feats, proposals, prop_valid, gt_bboxes, gt_valid,
            gt_labels, gt_masks, img_shapes, **roi_kwargs))
        return losses

    # ----------------------------------------------------------------- test
    def simple_test(self, img, img_shapes, scale_factors,
                    rescale: bool = True) -> Dict[str, jnp.ndarray]:
        """(reference: two_stage.py:187). Returns padded dets/labels/
        det_valid (+ mask_probs)."""
        feats = self.extract_feat(img)
        rpn_outs = self._rpn_head(feats)
        proposals, _, prop_valid = self._rpn_head.get_proposals(
            *rpn_outs, img_shapes,
            dict(dict(self.test_cfg)['rpn']))
        return self._roi_head.simple_test(
            feats, proposals, prop_valid, img_shapes, scale_factors,
            rescale=rescale)

    # ------------------------------------------------------------- aug test
    # Per-aug jittable halves of TTA; the flip/scale mapping + averaging
    # across augs is orchestrated on host (apis/aug_test.py), mirroring
    # reference base.py:125 forward_test → aug_test.
    def aug_rpn_test(self, img, img_shapes):
        """One aug's RPN proposals in ITS OWN frame: (proposals (B,P,4),
        scores (B,P), valid (B,P))."""
        feats = self.extract_feat(img)
        rpn_outs = self._rpn_head(feats)
        return self._rpn_head.get_proposals(
            *rpn_outs, img_shapes,
            dict(dict(self.test_cfg)['rpn']))

    def aug_bbox_test(self, img, proposals, img_shapes):
        """RoI bbox branch on given proposals (aug frame, no NMS):
        (scores (B,P,C+1), boxes (B,P,4k))."""
        feats = self.extract_feat(img)
        return self._roi_head.bbox_test(feats, proposals, img_shapes)

    def aug_mask_test(self, img, det_boxes, det_labels):
        """Mask probs (B,M,s,s) for given det boxes in the aug frame."""
        feats = self.extract_feat(img)
        return self._roi_head.mask_test(feats, det_boxes, det_labels)


@DETECTORS.register_module()
class CascadeRCNN(TwoStageDetector):
    """(reference: cascade_rcnn.py:6)."""


@DETECTORS.register_module()
class MaskRCNN(TwoStageDetector):
    """(reference: mask_rcnn.py:6)."""


@DETECTORS.register_module()
class FasterRCNN(TwoStageDetector):
    """(reference: faster_rcnn.py)."""


@DETECTORS.register_module()
class HybridTaskCascade(CascadeRCNN):
    """(reference: detectors/htc.py) — semantic-aware cascade; the base
    forward_train already plumbs gt_semantic_seg through."""


@DETECTORS.register_module()
class MaskScoringRCNN(TwoStageDetector):
    """(reference: detectors/mask_scoring_rcnn.py)."""


@DETECTORS.register_module()
class GridRCNN(TwoStageDetector):
    """(reference: detectors/grid_rcnn.py:6)."""


@DETECTORS.register_module()
class PointRend(TwoStageDetector):
    """(reference: detectors/point_rend.py:6) — plain two-stage wrapper
    around PointRendRoIHead."""


@DETECTORS.register_module()
class SCNet(CascadeRCNN):
    """(reference: detectors/scnet.py:6)."""


@DETECTORS.register_module()
class FastRCNN(TwoStageDetector):
    """Fast R-CNN — two-stage detector driven by PRE-COMPUTED proposals
    (reference: detectors/fast_rcnn.py:6; pipeline `LoadProposals`).
    No RPN: ``proposals`` (B, P, 4) + ``prop_valid`` (B, P) come from
    the data pipeline (e.g. an offline RPN run or selective search)."""

    def forward_dummy(self, img: jnp.ndarray, num_rois: int = 100):
        feats = self.extract_feat(img)
        return self._roi_head.forward_dummy(feats, num_rois)

    def forward_train(self, img, img_shapes, pad_shapes, gt_bboxes,
                      gt_valid, gt_labels, proposals, prop_valid,
                      gt_masks=None):
        feats = self.extract_feat(img, train=True)
        rcnn_rng = self.make_rng('sampling')
        return dict(self._roi_head.forward_train(
            rcnn_rng, feats, proposals, prop_valid, gt_bboxes, gt_valid,
            gt_labels, gt_masks, img_shapes))

    def simple_test(self, img, img_shapes, scale_factors, proposals,
                    prop_valid, rescale: bool = True):
        feats = self.extract_feat(img)
        return self._roi_head.simple_test(
            feats, proposals, prop_valid, img_shapes, scale_factors,
            rescale=rescale)


@DETECTORS.register_module()
class TridentFasterRCNN(FasterRCNN):
    """TridentNet (reference: detectors/trident_faster_rcnn.py:6;
    arXiv:1901.01892). The TridentResNet backbone folds its branches
    into the batch axis in train mode, so this detector just tiles the
    per-image targets/shapes ``num_branch`` times (reference
    forward_train:59 makes the same copies of img_metas/gts); at test
    time the backbone emits only ``test_branch_idx`` and the plain
    two-stage path applies."""

    def forward_train(self, img, img_shapes, pad_shapes, gt_bboxes,
                      gt_valid, gt_labels, gt_masks=None,
                      gt_semantic_seg=None):
        nb = dict(self.backbone).get('num_branch', 3)

        def t(a):
            return None if a is None else jnp.tile(
                a, (nb,) + (1,) * (a.ndim - 1))

        feats = self.extract_feat(img, train=True)   # (nb*B, ...)
        img_shapes, pad_shapes = t(img_shapes), t(pad_shapes)
        gt_bboxes, gt_valid = t(gt_bboxes), t(gt_valid)
        gt_labels, gt_masks = t(gt_labels), t(gt_masks)
        losses = {}
        rpn_rng = self.make_rng('sampling')
        rcnn_rng = self.make_rng('sampling')
        rpn_outs = self._rpn_head(feats, train=True)
        losses.update(self._rpn_head.loss(
            rpn_rng, *rpn_outs, gt_bboxes, gt_valid, None,
            img_shapes, pad_shapes))
        proposal_cfg = dict(self.train_cfg).get(
            'rpn_proposal', dict(self.test_cfg)['rpn'])
        proposals, _, prop_valid = self._rpn_head.get_proposals(
            *rpn_outs, img_shapes, dict(proposal_cfg))
        proposals = jax.lax.stop_gradient(proposals)
        losses.update(self._roi_head.forward_train(
            rcnn_rng, feats, proposals, prop_valid, gt_bboxes, gt_valid,
            gt_labels, gt_masks, img_shapes))
        return losses
