"""Single-stage detector (reference: mmdet/models/detectors/
single_stage.py:10) + one-line subclasses (retinanet.py, fcos.py,
reppoints_detector.py:6).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import (DETECTORS, build_backbone, build_detector
                       as build_detector_cfg, build_head, build_neck)


@DETECTORS.register_module()
class SingleStageDetector(nn.Module):
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    bbox_head: Optional[dict] = None
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
        self._bbox_head = build_head(self._with_dtype(dict(
            self.bbox_head, train_cfg=self.train_cfg,
            test_cfg=self.test_cfg)))

    def extract_feat(self, img: jnp.ndarray, train: bool = False):
        x = self._backbone(img, train=train)
        if self.neck is not None:
            if isinstance(self._neck, (list, tuple)):
                for n in self._neck:
                    x = n(x, train=train)
            else:
                x = self._neck(x, train=train)
        return x

    def __call__(self, img: jnp.ndarray, train: bool = False):
        return self.extract_feat(img, train=train)

    def forward_dummy(self, img: jnp.ndarray, num_rois: int = 100):
        feats = self.extract_feat(img)
        return self._bbox_head(feats)

    def forward_train(self, img, img_shapes, pad_shapes, gt_bboxes,
                      gt_valid, gt_labels,
                      gt_masks=None) -> Dict[str, jnp.ndarray]:
        """(reference: single_stage.py forward_train)."""
        feats = self.extract_feat(img, train=True)
        rng = self.make_rng('sampling')
        outs = self._bbox_head(feats, train=True)
        if not isinstance(outs[0], (tuple, list)):
            outs = (outs,)
        return self._bbox_head.loss(rng, *outs,
                                    gt_bboxes, gt_valid, gt_labels,
                                    img_shapes, pad_shapes)

    def simple_test(self, img, img_shapes, scale_factors,
                    rescale: bool = True) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(img)
        outs = self._bbox_head(feats)
        if not isinstance(outs[0], (tuple, list)):
            outs = (outs,)
        res = self._bbox_head.get_bboxes(
            *outs, img_shapes, scale_factors,
            cfg=dict(self.test_cfg), rescale=rescale)
        return dict(dets=res.dets, labels=res.labels,
                    det_valid=res.valid)

    def aug_bbox_test(self, img, img_shapes):
        """Per-aug half of single-stage TTA (reference:
        dense_test_mixins.py:60 aug_test_bboxes): pre-NMS candidates in
        the AUG frame — (boxes (B,P,4), scores (B,P,C+1), factors
        (B,P) or None). The host merges augs and runs one NMS
        (apis/aug_test.py aug_test_single_stage)."""
        feats = self.extract_feat(img)
        outs = self._bbox_head(feats)
        if not isinstance(outs[0], (tuple, list)):
            # single pred-map-tuple heads (YOLOv3) return a flat tuple
            # of per-level arrays
            outs = (outs,)
        b = img.shape[0]
        sf = jnp.ones((b, 4), jnp.float32)
        res = self._bbox_head.get_bboxes(
            *outs, img_shapes, sf, cfg=dict(self.test_cfg),
            rescale=False, with_nms=False)
        boxes, scores = res[0], res[1]
        factors = res[2] if len(res) > 2 else None
        return boxes, scores, factors


@DETECTORS.register_module()
class RetinaNet(SingleStageDetector):
    """(reference: retinanet.py)."""


@DETECTORS.register_module()
class RepPointsDetector(SingleStageDetector):
    """(reference: reppoints_detector.py:6) — 3-output head."""

    def forward_train(self, img, img_shapes, pad_shapes, gt_bboxes,
                      gt_valid, gt_labels, gt_masks=None):
        feats = self.extract_feat(img, train=True)
        rng = self.make_rng('sampling')
        cls_scores, pts_init, pts_refine = self._bbox_head(feats,
                                                           train=True)
        return self._bbox_head.loss(rng, cls_scores, pts_init,
                                    pts_refine, gt_bboxes, gt_valid,
                                    gt_labels, img_shapes, pad_shapes)

    def simple_test(self, img, img_shapes, scale_factors,
                    rescale: bool = True):
        feats = self.extract_feat(img)
        cls_scores, pts_init, pts_refine = self._bbox_head(feats)
        res = self._bbox_head.get_bboxes(
            cls_scores, pts_init, pts_refine, img_shapes, scale_factors,
            cfg=dict(self.test_cfg), rescale=rescale)
        return dict(dets=res.dets, labels=res.labels,
                    det_valid=res.valid)


@DETECTORS.register_module()
class ATSS(SingleStageDetector):
    """(reference: detectors/atss.py) — 3-output head (cls, bbox,
    centerness); same dispatch shape as FCOS."""

    def forward_train(self, img, img_shapes, pad_shapes, gt_bboxes,
                      gt_valid, gt_labels, gt_masks=None):
        feats = self.extract_feat(img, train=True)
        rng = self.make_rng('sampling')
        cls, reg, cness = self._bbox_head(feats, train=True)
        return self._bbox_head.loss(rng, cls, reg, cness, gt_bboxes,
                                    gt_valid, gt_labels, img_shapes,
                                    pad_shapes)

    def simple_test(self, img, img_shapes, scale_factors,
                    rescale: bool = True):
        feats = self.extract_feat(img)
        cls, reg, cness = self._bbox_head(feats)
        res = self._bbox_head.get_bboxes(
            cls, reg, cness, img_shapes, scale_factors,
            cfg=dict(self.test_cfg), rescale=rescale)
        return dict(dets=res.dets, labels=res.labels,
                    det_valid=res.valid)


@DETECTORS.register_module()
class GFL(SingleStageDetector):
    """(reference: detectors/gfl.py) — standard 2-output dispatch."""


@DETECTORS.register_module()
class FCOS(SingleStageDetector):
    """(reference: fcos.py) — 3-output head (cls, bbox, centerness)."""

    def forward_train(self, img, img_shapes, pad_shapes, gt_bboxes,
                      gt_valid, gt_labels, gt_masks=None):
        feats = self.extract_feat(img, train=True)
        rng = self.make_rng('sampling')
        cls, reg, cness = self._bbox_head(feats, train=True)
        return self._bbox_head.loss(rng, cls, reg, cness, gt_bboxes,
                                    gt_valid, gt_labels, img_shapes,
                                    pad_shapes)

    def simple_test(self, img, img_shapes, scale_factors,
                    rescale: bool = True):
        feats = self.extract_feat(img)
        cls, reg, cness = self._bbox_head(feats)
        res = self._bbox_head.get_bboxes(
            cls, reg, cness, img_shapes, scale_factors,
            cfg=dict(self.test_cfg), rescale=rescale)
        return dict(dets=res.dets, labels=res.labels,
                    det_valid=res.valid)


@DETECTORS.register_module()
class NASFCOS(FCOS):
    """(reference: detectors/nasfcos.py) — FCOS with searched neck and
    head (NASFCOS_FPN + NASFCOSHead)."""


@DETECTORS.register_module()
class YOLOV3(SingleStageDetector):
    """(reference: detectors/yolo.py) — single pred-map-tuple head."""

    def forward_train(self, img, img_shapes, pad_shapes, gt_bboxes,
                      gt_valid, gt_labels, gt_masks=None):
        feats = self.extract_feat(img, train=True)
        rng = self.make_rng('sampling')
        pred_maps = self._bbox_head(feats, train=True)
        return self._bbox_head.loss(rng, pred_maps, gt_bboxes, gt_valid,
                                    gt_labels, img_shapes, pad_shapes)

    def simple_test(self, img, img_shapes, scale_factors,
                    rescale: bool = True):
        feats = self.extract_feat(img)
        pred_maps = self._bbox_head(feats)
        res = self._bbox_head.get_bboxes(
            pred_maps, img_shapes, scale_factors,
            cfg=dict(self.test_cfg), rescale=rescale)
        return dict(dets=res.dets, labels=res.labels,
                    det_valid=res.valid)


@DETECTORS.register_module()
class VFNet(SingleStageDetector):
    """(reference: detectors/vfnet.py) — 3-output head (cls, init bbox,
    refined bbox)."""

    def forward_train(self, img, img_shapes, pad_shapes, gt_bboxes,
                      gt_valid, gt_labels, gt_masks=None):
        feats = self.extract_feat(img, train=True)
        rng = self.make_rng('sampling')
        cls, ini, ref = self._bbox_head(feats, train=True)
        return self._bbox_head.loss(rng, cls, ini, ref, gt_bboxes,
                                    gt_valid, gt_labels, img_shapes,
                                    pad_shapes)

    def simple_test(self, img, img_shapes, scale_factors,
                    rescale: bool = True):
        feats = self.extract_feat(img)
        cls, ini, ref = self._bbox_head(feats)
        res = self._bbox_head.get_bboxes(
            cls, ini, ref, img_shapes, scale_factors,
            cfg=dict(self.test_cfg), rescale=rescale)
        return dict(dets=res.dets, labels=res.labels,
                    det_valid=res.valid)


@DETECTORS.register_module()
class FSAF(RetinaNet):
    """(reference: detectors/fsaf.py)."""

@DETECTORS.register_module()
class CornerNet(SingleStageDetector):
    """(reference: detectors/cornernet.py:10) — hourglass backbone, no
    neck, CornerHead; TTA corner merging is handled by the generic
    single-stage aug path (the reference's aug_test flip-merge operates
    pre-NMS, which aug_test_single_stage reproduces)."""


@DETECTORS.register_module()
class CentripetalNet(SingleStageDetector):
    """(reference: detectors/cornernet.py — CentripetalNet shares the
    CornerNet detector shell with a CentripetalHead)."""


@DETECTORS.register_module()
class FOVEA(SingleStageDetector):
    """(reference: detectors/fovea.py:6)."""


@DETECTORS.register_module()
class PAA(SingleStageDetector):
    """(reference: detectors/paa.py:6) — 3-output head (cls, reg, iou);
    generic dispatch covers forward/test."""

    def forward_train(self, img, img_shapes, pad_shapes, gt_bboxes,
                      gt_valid, gt_labels, gt_masks=None):
        feats = self.extract_feat(img, train=True)
        rng = self.make_rng('sampling')
        cls_scores, bbox_preds, iou_preds = self._bbox_head(feats,
                                                            train=True)
        return self._bbox_head.loss(rng, cls_scores, bbox_preds,
                                    iou_preds, gt_bboxes, gt_valid,
                                    gt_labels, img_shapes, pad_shapes)


@DETECTORS.register_module()
class KnowledgeDistillationSingleStageDetector(SingleStageDetector):
    """(reference: detectors/kd_one_stage.py:11) — a frozen teacher's
    head outputs feed the student's distillation loss. Teacher params
    live under params/_teacher; freeze them with
    paramwise_cfg custom_keys {'_teacher': dict(lr_mult=0, decay_mult=0)}
    (the LD configs set this), mirroring the reference's exclusion of
    the teacher from the optimizer."""
    teacher_config: Optional[Any] = None
    teacher_ckpt: Optional[str] = None
    eval_teacher: bool = True

    def setup(self):
        super().setup()
        tc = self.teacher_config
        if isinstance(tc, str):
            from ...utils.config import Config
            tc = dict(Config.fromfile(tc).model)
        self._teacher = build_detector_cfg(self._with_dtype(dict(
            tc, name='_teacher')))

    def forward_dummy(self, img, num_rois: int = 100):
        # init must trace the teacher too, or its params never exist
        t = self._teacher._bbox_head(self._teacher.extract_feat(img))
        return super().forward_dummy(img, num_rois), t

    def forward_train(self, img, img_shapes, pad_shapes, gt_bboxes,
                      gt_valid, gt_labels, gt_masks=None):
        feats = self.extract_feat(img, train=True)
        rng = self.make_rng('sampling')
        outs = self._bbox_head(feats, train=True)
        t_feats = self._teacher.extract_feat(img)
        t_outs = self._teacher._bbox_head(t_feats)
        soft = jax.tree.map(jax.lax.stop_gradient, t_outs[1])
        return self._bbox_head.loss(rng, *outs, gt_bboxes, gt_valid,
                                    gt_labels, img_shapes, pad_shapes,
                                    soft_targets=soft)
