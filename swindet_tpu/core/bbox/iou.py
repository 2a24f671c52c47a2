"""IoU / IoF / GIoU overlaps — the single most reused geometric primitive.

TPU-native (pure jnp, broadcast-friendly) equivalent of the reference's
``bbox_overlaps`` (reference: mmdet/core/bbox/iou_calculators/
iou2d_calculator.py:43). Boxes are (x1, y1, x2, y2); widths are ``x2 - x1``
(mmdet v2 convention, no +1).
"""
from __future__ import annotations

import jax.numpy as jnp


def bbox_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 4) boxes."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def bbox_overlaps(bboxes1: jnp.ndarray, bboxes2: jnp.ndarray,
                  mode: str = 'iou', is_aligned: bool = False,
                  eps: float = 1e-6) -> jnp.ndarray:
    """Pairwise overlaps between two box sets.

    Args:
        bboxes1: (..., M, 4)
        bboxes2: (..., N, 4)
        mode: 'iou' | 'iof' (intersection over bboxes1's area) | 'giou'
        is_aligned: if True, M == N and overlaps are computed elementwise,
            returning (..., M); else returns (..., M, N).

    Matches reference semantics: union clamped by ``eps``; empty boxes give 0.
    """
    assert mode in ('iou', 'iof', 'giou'), f'unknown mode {mode}'
    area1 = bbox_area(bboxes1)
    area2 = bbox_area(bboxes2)

    if not is_aligned:
        b1 = bboxes1[..., :, None, :]   # (..., M, 1, 4)
        b2 = bboxes2[..., None, :, :]   # (..., 1, N, 4)
        area1 = area1[..., :, None]
        area2 = area2[..., None, :]
    else:
        b1, b2 = bboxes1, bboxes2

    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]

    if mode == 'iof':
        union = area1
    else:
        union = area1 + area2 - overlap
    union = jnp.maximum(union, eps)
    ious = overlap / union
    if mode in ('iou', 'iof'):
        return ious

    # GIoU: subtract normalized area of the smallest enclosing box.
    enclose_lt = jnp.minimum(b1[..., :2], b2[..., :2])
    enclose_rb = jnp.maximum(b1[..., 2:], b2[..., 2:])
    enclose_wh = jnp.clip(enclose_rb - enclose_lt, 0, None)
    enclose_area = jnp.maximum(enclose_wh[..., 0] * enclose_wh[..., 1], eps)
    return ious - (enclose_area - union) / enclose_area
