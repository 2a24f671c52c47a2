"""PISA — Prime Sample Attention (reference: mmdet/models/losses/
pisa_loss.py, arXiv:1904.04821): ISR-P (importance-based sample
reweighting of positives by IoU hierarchical local rank) and CARL
(classification-aware regression loss).

Static-shape port: the reference's per-unique-label / per-unique-gt
Python loops become masked pairwise rank counts (stable descending
order via index tiebreak), valid over padded positives.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _ranked_desc(values, group, mask):
    """rank[i] = #j in i's group with (v_j > v_i) or (v_j == v_i and
    j < i) — the stable descending-sort rank."""
    n = values.shape[0]
    idx = jnp.arange(n)
    same = (group[:, None] == group[None, :]) & mask[:, None] \
        & mask[None, :]
    higher = (values[None, :] > values[:, None]) | \
        ((values[None, :] == values[:, None]) & (idx[None, :]
                                                 < idx[:, None]))
    return jnp.sum(same & higher, axis=1).astype(jnp.float32)


def isr_p(cls_score, bbox_pred, labels, label_weights, bbox_targets,
          rois, gt_global, bbox_coder, num_classes: int,
          loss_cls=None, k: float = 2.0, bias: float = 0.0):
    """Importance-based sample reweighting over POSITIVE samples
    (reference: pisa_loss.py:8 isr_p). All inputs flattened (N, ...);
    ``gt_global`` is a batch-unique gt id per sample (any value for
    negatives). Returns the new label_weights."""
    pos = (labels >= 0) & (labels < num_classes)
    cls_det = jax.lax.stop_gradient(cls_score.astype(jnp.float32))
    pred_det = jax.lax.stop_gradient(bbox_pred.astype(jnp.float32))
    boxes = rois[:, 1:] if rois.shape[-1] == 5 else rois
    if pred_det.shape[-1] > 4:
        kk = pred_det.shape[-1] // 4
        safe = jnp.clip(labels, 0, kk - 1)
        pred_det = jnp.take_along_axis(
            pred_det.reshape(-1, kk, 4),
            safe[:, None, None].repeat(4, -1), axis=1)[:, 0]
    from ...core.bbox.iou import bbox_overlaps
    dec_pred = bbox_coder.decode(boxes, pred_det)
    dec_tgt = bbox_coder.decode(boxes, bbox_targets)
    ious = jnp.where(pos, bbox_overlaps(dec_pred, dec_tgt,
                                        is_aligned=True), 0.0)

    # max class population among positives
    counts = jnp.zeros((num_classes,)).at[
        jnp.clip(labels, 0, num_classes - 1)].add(
            pos.astype(jnp.float32))
    max_l_num = jnp.maximum(jnp.max(counts), 1.0)

    # level 1: rank within each gt; level 2: rank within each class
    rank1 = _ranked_desc(ious, gt_global, pos)
    ious2 = ious + (max_l_num - rank1)
    rank2 = _ranked_desc(ious2, labels, pos)          # IoU-HLR

    w = label_weights * (max_l_num - rank2) / max_l_num
    w = (bias + w * (1 - bias)) ** k

    # normalize so the weighted positive cls loss keeps its value
    pos_ce = loss_cls(cls_det, labels, reduction_override='none')
    if pos_ce.ndim > 1:
        pos_ce = pos_ce.sum(-1)
    pos_ce = jnp.where(pos, pos_ce, 0.0)
    ori = jnp.sum(pos_ce * jnp.where(pos, label_weights, 0.0))
    new = jnp.sum(pos_ce * jnp.where(pos, w, 0.0))
    ratio = ori / jnp.maximum(new, 1e-12)
    return jnp.where(pos, w * ratio, label_weights)


def carl_loss(cls_score, labels, bbox_pred, bbox_targets, loss_bbox,
              num_classes: int, k: float = 1.0, bias: float = 0.2,
              avg_factor: Optional[float] = None,
              sigmoid: bool = False):
    """Classification-aware regression loss (reference:
    pisa_loss.py:122)."""
    pos = (labels >= 0) & (labels < num_classes)
    safe = jnp.clip(labels, 0, num_classes - 1)
    probs = (jax.nn.sigmoid(cls_score.astype(jnp.float32))
             if sigmoid else
             jax.nn.softmax(cls_score.astype(jnp.float32), -1))
    pos_score = jnp.take_along_axis(probs, safe[:, None], axis=-1)[:, 0]
    w = (bias + (1 - bias) * pos_score) ** k
    w = jnp.where(pos, w, 0.0)
    num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
    w = w * num_pos / jnp.maximum(jnp.sum(w), 1e-12)
    if bbox_pred.shape[-1] > 4:
        kk = bbox_pred.shape[-1] // 4
        bbox_pred = jnp.take_along_axis(
            bbox_pred.reshape(-1, kk, 4),
            jnp.clip(safe, 0, kk - 1)[:, None, None].repeat(4, -1),
            axis=1)[:, 0]
    if avg_factor is None:
        avg_factor = float(labels.shape[0])
    reg = loss_bbox(bbox_pred, bbox_targets,
                    reduction_override='none') / avg_factor
    if reg.ndim > 1:
        reg = reg * w[:, None]
    else:
        reg = reg * w
    return dict(loss_carl=jnp.sum(reg))
