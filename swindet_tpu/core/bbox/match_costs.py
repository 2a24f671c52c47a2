"""Match costs for set-prediction assignment (reference:
mmdet/core/bbox/match_costs/match_cost.py).

Each cost maps predictions x padded GTs to a (num_pred, G) matrix;
invalid GT columns are left as-is and neutralized by the assigner.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registries import MATCH_COSTS
from ...utils.registry import build_from_cfg
from .iou import bbox_overlaps
from .transforms import bbox_cxcywh_to_xyxy, bbox_xyxy_to_cxcywh


def build_match_cost(cfg):
    return build_from_cfg(cfg, MATCH_COSTS)


@MATCH_COSTS.register_module()
class BBoxL1Cost:
    """L1 distance between normalized boxes (match_cost.py:9).

    box_format 'xyxy': pred cxcywh is converted to xyxy (DETR);
    'xywh': gt xyxy is converted to cxcywh (Sparse R-CNN).
    """

    def __init__(self, weight: float = 1., box_format: str = 'xyxy'):
        assert box_format in ('xyxy', 'xywh')
        self.weight = weight
        self.box_format = box_format

    def __call__(self, bbox_pred, gt_bboxes):
        if self.box_format == 'xywh':
            gt_bboxes = bbox_xyxy_to_cxcywh(gt_bboxes)
        else:
            bbox_pred = bbox_cxcywh_to_xyxy(bbox_pred)
        cost = jnp.sum(
            jnp.abs(bbox_pred[:, None, :] - gt_bboxes[None, :, :]), -1)
        return cost * self.weight


@MATCH_COSTS.register_module()
class ClassificationCost:
    """-softmax(pred)[gt_label] (match_cost.py:102)."""

    def __init__(self, weight: float = 1.):
        self.weight = weight

    def __call__(self, cls_pred, gt_labels):
        scores = jax.nn.softmax(cls_pred.astype(jnp.float32), -1)
        return -scores[:, gt_labels] * self.weight


@MATCH_COSTS.register_module()
class FocalLossCost:
    """Focal pos-neg cost on sigmoid scores (match_cost.py:53)."""

    def __init__(self, weight: float = 1., alpha: float = 0.25,
                 gamma: float = 2., eps: float = 1e-12):
        self.weight = weight
        self.alpha = alpha
        self.gamma = gamma
        self.eps = eps

    def __call__(self, cls_pred, gt_labels):
        p = jax.nn.sigmoid(cls_pred.astype(jnp.float32))
        neg = -jnp.log(1 - p + self.eps) * (1 - self.alpha) * \
            p ** self.gamma
        pos = -jnp.log(p + self.eps) * self.alpha * (1 - p) ** self.gamma
        return (pos - neg)[:, gt_labels] * self.weight


@MATCH_COSTS.register_module()
class IoUCost:
    """-overlap in the given iou mode (match_cost.py:146)."""

    def __init__(self, iou_mode: str = 'giou', weight: float = 1.):
        self.weight = weight
        self.iou_mode = iou_mode

    def __call__(self, bboxes, gt_bboxes):
        return -bbox_overlaps(bboxes, gt_bboxes,
                              mode=self.iou_mode) * self.weight
