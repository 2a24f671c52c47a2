"""Box transform utilities (reference: mmdet/core/bbox/transforms.py:5-159).

All functions are pure jnp and shape-preserving; the ragged python-list
conventions of the reference (bbox2result per-class numpy lists) live only
at the host boundary (`bbox2result` here takes padded device arrays +
validity mask and emits the reference's numpy format).
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


def bbox_flip(bboxes: jnp.ndarray, img_shape: Tuple[int, int],
              direction: str = 'horizontal') -> jnp.ndarray:
    """Flip boxes (..., 4k) inside an (H, W) image."""
    h, w = img_shape[0], img_shape[1]
    x1, y1, x2, y2 = (bboxes[..., 0::4], bboxes[..., 1::4],
                      bboxes[..., 2::4], bboxes[..., 3::4])
    if direction == 'horizontal':
        x1, x2 = w - x2, w - x1
    elif direction == 'vertical':
        y1, y2 = h - y2, h - y1
    elif direction == 'diagonal':
        x1, x2 = w - x2, w - x1
        y1, y2 = h - y2, h - y1
    else:
        raise ValueError(f'Invalid flip direction: {direction}')
    out = jnp.empty_like(bboxes)
    out = out.at[..., 0::4].set(x1)
    out = out.at[..., 1::4].set(y1)
    out = out.at[..., 2::4].set(x2)
    out = out.at[..., 3::4].set(y2)
    return out


def bbox_mapping(bboxes, img_shape, scale_factor, flip,
                 flip_direction='horizontal'):
    """Map boxes from original image scale to testing scale."""
    new = bboxes * jnp.asarray(scale_factor, bboxes.dtype)
    if flip:
        new = bbox_flip(new, img_shape, flip_direction)
    return new


def bbox_mapping_back(bboxes, img_shape, scale_factor, flip,
                      flip_direction='horizontal'):
    """Map boxes from testing scale back to original image scale."""
    new = bbox_flip(bboxes, img_shape, flip_direction) if flip else bboxes
    return new / jnp.asarray(scale_factor, bboxes.dtype)


def bbox2roi(bbox_list: List[jnp.ndarray]) -> jnp.ndarray:
    """Concat per-image (N_i, 4) boxes into (sum N_i, 5) rois whose first
    column is the batch index (reference: transforms.py:58)."""
    rois = []
    for img_id, bboxes in enumerate(bbox_list):
        idx = jnp.full((bboxes.shape[0], 1), float(img_id), bboxes.dtype)
        rois.append(jnp.concatenate([idx, bboxes[:, :4]], axis=-1))
    return jnp.concatenate(rois, axis=0)


def roi2bbox(rois: jnp.ndarray) -> List[np.ndarray]:
    rois = np.asarray(rois)
    return [rois[rois[:, 0] == i, 1:] for i in np.unique(rois[:, 0])]


def bbox2result(bboxes, labels, num_classes: int,
                valid=None) -> List[np.ndarray]:
    """Convert padded detections to the reference's per-class numpy format:
    list of ``num_classes`` arrays of shape (k, 5) (reference:
    transforms.py:99). ``valid`` masks out padding rows."""
    bboxes = np.asarray(bboxes, dtype=np.float32)
    labels = np.asarray(labels)
    if valid is not None:
        valid = np.asarray(valid).astype(bool)
        bboxes = bboxes[valid]
        labels = labels[valid]
    if bboxes.shape[0] == 0:
        return [np.zeros((0, 5), dtype=np.float32)
                for _ in range(num_classes)]
    return [bboxes[labels == i, :5] for i in range(num_classes)]


def bbox_cxcywh_to_xyxy(bbox: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(bbox, 4, axis=-1)
    return jnp.concatenate(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1)


def bbox_xyxy_to_cxcywh(bbox: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(bbox, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)
