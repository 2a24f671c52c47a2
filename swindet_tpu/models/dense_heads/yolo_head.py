"""YOLOV3Head (reference: mmdet/models/dense_heads/yolo_head.py:20).

Per level: a 3x3 bridge ConvModule + 1x1 pred conv producing
num_anchors * (5 + C) attributes. Targets are dense per-anchor maps
(bbox-encoded xywh + objectness + one-hot labels) built with the
GridAssigner over responsible cells — already the natural static-shape
formulation, so the port is direct.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..builder import (HEADS, build_anchor_generator, build_assigner,
                       build_bbox_coder, build_loss, build_sampler)
from ..layers import ConvModule
from ...core.nms import multiclass_nms

_ACT = dict(type='LeakyReLU', negative_slope=0.1)
_BN = dict(type='BN', requires_grad=True)


@HEADS.register_module()
class YOLOV3Head(nn.Module):
    num_classes: int = 80
    in_channels: Sequence[int] = (512, 256, 128)
    out_channels: Sequence[int] = (1024, 512, 256)
    anchor_generator: Optional[dict] = None
    bbox_coder: Optional[dict] = None
    featmap_strides: Sequence[int] = (32, 16, 8)
    one_hot_smoother: float = 0.
    loss_cls: Optional[dict] = None
    loss_conf: Optional[dict] = None
    loss_xy: Optional[dict] = None
    loss_wh: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @property
    def num_attrib(self):
        return 5 + self.num_classes

    @property
    def num_levels(self):
        return len(self.featmap_strides)

    def setup(self):
        ag = self.anchor_generator or dict(
            type='YOLOAnchorGenerator',
            base_sizes=[[(116, 90), (156, 198), (373, 326)],
                        [(30, 61), (62, 45), (59, 119)],
                        [(10, 13), (16, 30), (33, 23)]],
            strides=[32, 16, 8])
        self.prior_generator = build_anchor_generator(dict(ag))
        self._bbox_coder = build_bbox_coder(dict(
            self.bbox_coder or dict(type='YOLOBBoxCoder')))
        self._loss_cls = build_loss(dict(
            self.loss_cls or dict(type='CrossEntropyLoss',
                                  use_sigmoid=True, loss_weight=1.0,
                                  reduction='sum')))
        self._loss_conf = build_loss(dict(
            self.loss_conf or dict(type='CrossEntropyLoss',
                                   use_sigmoid=True, loss_weight=1.0,
                                   reduction='sum')))
        self._loss_xy = build_loss(dict(
            self.loss_xy or dict(type='CrossEntropyLoss',
                                 use_sigmoid=True, loss_weight=2.0,
                                 reduction='sum')))
        self._loss_wh = build_loss(dict(
            self.loss_wh or dict(type='MSELoss', loss_weight=2.0,
                                 reduction='sum')))
        if self.train_cfg:
            self._assigner = build_assigner(dict(self.train_cfg['assigner']))
        self.convs_bridge = [
            ConvModule(self.out_channels[i], 3, padding=1, norm_cfg=_BN,
                       act_cfg=_ACT, dtype=self.dtype,
                       name=f'convs_bridge{i}')
            for i in range(self.num_levels)]
        num_anchors = self.prior_generator.num_base_anchors
        self.convs_pred = [
            nn.Conv(num_anchors[i] * self.num_attrib, (1, 1),
                    dtype=self.dtype, name=f'convs_pred{i}')
            for i in range(self.num_levels)]

    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        assert len(feats) == self.num_levels
        pred_maps = []
        for i in range(self.num_levels):
            x = self.convs_bridge[i](feats[i], train=train)
            pred_maps.append(self.convs_pred[i](x))
        return tuple(pred_maps)

    # ------------------------------------------------------------- targets
    def _target_single(self, featmap_sizes, flat_anchors, anchor_strides,
                       gt_bboxes, gt_valid, gt_labels):
        """Dense target map for one image (reference:
        yolo_head.py:500 _get_targets_single)."""
        resp = jnp.concatenate(
            self.prior_generator.responsible_flags(
                featmap_sizes, gt_bboxes, gt_valid), 0)
        assign = self._assigner.assign(flat_anchors, resp, gt_bboxes,
                                       gt_valid, gt_labels)
        pos = assign.gt_inds > 0
        neg = assign.gt_inds == 0
        g = gt_bboxes.shape[0]
        gt_idx = jnp.clip(assign.gt_inds - 1, 0, g - 1)
        pos_gt = jnp.take(gt_bboxes, gt_idx, axis=0)
        xywh = self._bbox_coder.encode(flat_anchors, pos_gt,
                                       anchor_strides)
        one_hot = jax.nn.one_hot(
            jnp.take(gt_labels.astype(jnp.int32), gt_idx),
            self.num_classes)
        if self.one_hot_smoother != 0:
            one_hot = one_hot * (1 - self.one_hot_smoother) + \
                self.one_hot_smoother / self.num_classes
        n = flat_anchors.shape[0]
        target_map = jnp.concatenate(
            [jnp.where(pos[:, None], xywh, 0.0),
             pos[:, None].astype(jnp.float32),
             jnp.where(pos[:, None], one_hot, 0.0)], axis=-1)
        return target_map, neg

    # ---------------------------------------------------------------- loss
    def loss(self, rng, pred_maps, gt_bboxes, gt_valid, gt_labels,
             img_shapes, pad_shapes) -> Dict[str, jnp.ndarray]:
        """(reference: yolo_head.py loss:369 + loss_single:420)."""
        featmap_sizes = tuple((p.shape[1], p.shape[2]) for p in pred_maps)
        anchors = self.prior_generator.grid_anchors(featmap_sizes)
        flat_anchors = jnp.concatenate(anchors, 0)
        anchor_strides = jnp.concatenate([
            jnp.full((a.shape[0],), float(s), jnp.float32)
            for a, s in zip(anchors, self.featmap_strides)])
        b = gt_bboxes.shape[0]

        target_map, neg_map = jax.vmap(
            lambda gb, gv, gl: self._target_single(
                featmap_sizes, flat_anchors, anchor_strides, gb, gv, gl)
        )(gt_bboxes, gt_valid, gt_labels)

        # the reference reduces PER LEVEL (multi_apply over loss_single,
        # each a weighted mean over that level's elements) and sums the
        # per-level means (yolo_head.py:369,:456-460) — a global mean
        # over the concatenated levels weights levels differently
        nas = self.prior_generator.num_base_anchors
        counts = [int(np.prod(fs)) * nas[i]
                  for i, fs in enumerate(featmap_sizes)]
        offs = np.cumsum([0] + counts)
        loss_cls = loss_conf = loss_xy = loss_wh = 0.
        for lvl in range(len(pred_maps)):
            pred = pred_maps[lvl].reshape(
                b, -1, self.num_attrib).astype(jnp.float32)
            tm = target_map[:, offs[lvl]:offs[lvl + 1]]
            nm = neg_map[:, offs[lvl]:offs[lvl + 1]]
            pos_mask = tm[..., 4]
            pos_and_neg = jnp.clip(
                pos_mask + nm.astype(jnp.float32), 0., 1.)
            loss_cls += self._loss_cls(pred[..., 5:], tm[..., 5:],
                                       weight=pos_mask[..., None])
            loss_conf += self._loss_conf(pred[..., 4], pos_mask,
                                         weight=pos_and_neg)
            loss_xy += self._loss_xy(pred[..., :2], tm[..., :2],
                                     weight=pos_mask[..., None])
            loss_wh += self._loss_wh(pred[..., 2:4], tm[..., 2:4],
                                     weight=pos_mask[..., None])
        return dict(loss_cls=loss_cls, loss_conf=loss_conf,
                    loss_xy=loss_xy, loss_wh=loss_wh)

    # --------------------------------------------------------------- boxes
    def get_bboxes(self, pred_maps, img_shapes, scale_factors, cfg=None,
                   rescale: bool = True, with_nms: bool = True):
        """(reference: yolo_head.py _get_bboxes:210 — sigmoid xy/conf/cls,
        conf_thr filter, conf-factored NMS)."""
        cfg = dict(cfg or self.test_cfg)
        featmap_sizes = [p.shape[1:3] for p in pred_maps]
        anchors = self.prior_generator.grid_anchors(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)
        conf_thr = cfg.get('conf_thr', -1)
        b = pred_maps[0].shape[0]

        def per_image(preds_lvls, img_shape, scale_factor):
            mlvl_boxes, mlvl_scores, mlvl_conf = [], [], []
            for lvl, pm in enumerate(preds_lvls):
                pm = pm.reshape(-1, self.num_attrib).astype(jnp.float32)
                stride = float(self.featmap_strides[lvl])
                xy = jax.nn.sigmoid(pm[:, :2])
                boxes = self._bbox_coder.decode(
                    anchors[lvl], jnp.concatenate([xy, pm[:, 2:4]], -1),
                    stride)
                conf = jax.nn.sigmoid(pm[:, 4])
                cls = jax.nn.sigmoid(pm[:, 5:])
                if 0 < nms_pre < conf.shape[0]:
                    from ...core.nms import fast_topk
                    _, topk = fast_topk(conf, nms_pre)
                    boxes, conf, cls = boxes[topk], conf[topk], cls[topk]
                mlvl_boxes.append(boxes)
                mlvl_scores.append(cls)
                mlvl_conf.append(conf)
            boxes = jnp.concatenate(mlvl_boxes, 0)
            scores = jnp.concatenate(mlvl_scores, 0)
            conf = jnp.concatenate(mlvl_conf, 0)
            if rescale:
                boxes = boxes / scale_factor[None, :4]
            valid = conf >= conf_thr if conf_thr > 0 else None
            scores = jnp.concatenate(
                [scores, jnp.zeros_like(scores[:, :1])], -1)
            if not with_nms:
                # fold conf_thr into the factor so the TTA merge keeps
                # the same filtering semantics
                fconf = conf if valid is None else jnp.where(valid, conf,
                                                             0.0)
                return boxes, scores, fconf
            return multiclass_nms(boxes, scores, cfg['score_thr'],
                                  dict(cfg['nms']),
                                  cfg.get('max_per_img', 100),
                                  score_factors=conf, valid=valid)

        return jax.vmap(per_image)(
            [p.reshape(b, -1, p.shape[-1]) for p in pred_maps],
            img_shapes, scale_factors)
