"""Test-time augmentation orchestration for two-stage detectors.

Mirrors the reference's aug_test path (reference:
mmdet/models/detectors/base.py:125 forward_test fan-out,
mmdet/models/roi_heads/test_mixins.py:118 aug_test_bboxes / :238
aug_test_mask, mmdet/core/post_processing/merge_augs.py:8
merge_aug_proposals / :80 merge_aug_bboxes / :123 merge_aug_masks).

TPU shape discipline: each aug (scale × flip) is its own fixed canvas —
one compiled program per aug shape. The device runs three jitted halves
per aug (RPN, RoI-bbox, RoI-mask); the cheap coordinate mapping
(flip-back, rescale) and cross-aug averaging run on host over small
padded arrays. Merged-proposal NMS and the final multiclass NMS run on
device (exact tiled NMS).

An ``aug_batch`` is a dict with:
  img (B,H,W,3) jnp · img_shapes (B,2) int · scale_factors (B,4) ·
  flip (bool) · flip_direction (str)
All augs of one call share the batch dimension B (same B images).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ..core.nms import multiclass_nms, nms


def _flip_boxes_np(boxes: np.ndarray, img_shapes: np.ndarray,
                   direction: str) -> np.ndarray:
    """Flip (B, P, 4k) boxes inside per-image (h, w) resized shapes."""
    out = boxes.copy()
    w = img_shapes[:, 1].astype(np.float32)[:, None, None]
    h = img_shapes[:, 0].astype(np.float32)[:, None, None]
    x1 = boxes[..., 0::4]
    y1 = boxes[..., 1::4]
    x2 = boxes[..., 2::4]
    y2 = boxes[..., 3::4]
    if direction in ('horizontal', 'diagonal'):
        out[..., 0::4] = w - x2
        out[..., 2::4] = w - x1
    if direction in ('vertical', 'diagonal'):
        out[..., 1::4] = h - y2
        out[..., 3::4] = h - y1
    return out


def map_boxes_back(boxes, aug_batch) -> np.ndarray:
    """Aug frame → original image frame (bbox_mapping_back semantics:
    un-flip in the aug's resized shape, then divide scale_factor)."""
    boxes = np.asarray(boxes, np.float32)
    shapes = np.asarray(aug_batch['img_shapes'])
    sf = np.asarray(aug_batch['scale_factors'], np.float32)
    if aug_batch.get('flip'):
        boxes = _flip_boxes_np(boxes, shapes,
                               aug_batch.get('flip_direction', 'horizontal'))
    b, p = boxes.shape[:2]
    k = boxes.shape[-1] // 4
    return (boxes.reshape(b, p, k, 4) /
            sf[:, None, None, :]).reshape(b, p, 4 * k)


def map_boxes_to_aug(boxes, aug_batch) -> np.ndarray:
    """Original image frame → aug frame (bbox_mapping semantics:
    multiply scale_factor, then flip in the aug's resized shape)."""
    boxes = np.asarray(boxes, np.float32)
    shapes = np.asarray(aug_batch['img_shapes'])
    sf = np.asarray(aug_batch['scale_factors'], np.float32)
    b, p = boxes.shape[:2]
    k = boxes.shape[-1] // 4
    boxes = (boxes.reshape(b, p, k, 4) *
             sf[:, None, None, :]).reshape(b, p, 4 * k)
    if aug_batch.get('flip'):
        boxes = _flip_boxes_np(boxes, shapes,
                               aug_batch.get('flip_direction', 'horizontal'))
    return boxes


def _jit(handle, name, fn):
    if name not in handle._jitted:
        handle._jitted[name] = jax.jit(fn)
    return handle._jitted[name]


def aug_test_single_stage(handle, aug_batches: List[Dict]) -> Dict:
    """Single-stage TTA (reference: dense_test_mixins.py:60
    aug_test_bboxes): each aug contributes its pre-NMS candidates
    (boxes, scores, optional score factors) mapped back to the
    original frame; candidates are CONCATENATED across augs (not
    averaged — no shared proposal set exists) and one multiclass NMS
    produces the final detections."""
    module = handle.module
    cfg = dict(module.test_cfg)
    run = _jit(handle, 'aug_ss_bbox', lambda v, img, shp: module.apply(
        v, img, shp, method='aug_bbox_test'))

    bs, ss, fs = [], [], []
    for ab in aug_batches:
        boxes, scores, factors = jax.device_get(
            run(handle.variables, ab['img'], ab['img_shapes']))
        bs.append(map_boxes_back(boxes, ab))      # → original frame
        ss.append(np.asarray(scores, np.float32))
        fs.append(None if factors is None
                  else np.asarray(factors, np.float32))
    cat_b = np.concatenate(bs, axis=1)
    cat_s = np.concatenate(ss, axis=1)
    cat_f = None if fs[0] is None else np.concatenate(fs, axis=1)

    # the per-image candidate pool is n_aug× the single-scale one —
    # scale the NMS entry cap so merging can't drop candidates a
    # single aug would have kept
    cap = 2048 * len(aug_batches)
    if cat_f is None:
        final = _jit(handle, 'aug_ss_nms', lambda bx, sc: jax.vmap(
            lambda b_, s_: multiclass_nms(
                b_, s_, cfg['score_thr'], dict(cfg['nms']),
                cfg.get('max_per_img', 100), pre_nms_cap=cap))(bx, sc))
        nres = jax.device_get(final(jnp.asarray(cat_b),
                                    jnp.asarray(cat_s)))
    else:
        final = _jit(handle, 'aug_ss_nms_f', lambda bx, sc, fc: jax.vmap(
            lambda b_, s_, f_: multiclass_nms(
                b_, s_, cfg['score_thr'], dict(cfg['nms']),
                cfg.get('max_per_img', 100), score_factors=f_,
                pre_nms_cap=cap))(bx, sc, fc))
        nres = jax.device_get(final(jnp.asarray(cat_b),
                                    jnp.asarray(cat_s),
                                    jnp.asarray(cat_f)))
    return dict(dets=np.asarray(nres.dets),
                labels=np.asarray(nres.labels),
                det_valid=np.asarray(nres.valid))


def aug_test_two_stage(handle, aug_batches: List[Dict]) -> Dict:
    """Run TTA over ``aug_batches``; returns padded outputs in the
    ORIGINAL image frame (same schema as simple_test with rescale)."""
    module = handle.module
    test_cfg = dict(module.test_cfg)
    rpn_cfg = dict(test_cfg['rpn'])
    rcnn_cfg = dict(test_cfg['rcnn'])
    rpn_iou = float(dict(rpn_cfg['nms'])['iou_threshold'])
    rpn_max = int(rpn_cfg.get('max_per_img', rpn_cfg.get('max_num', 1000)))
    n_aug = len(aug_batches)

    rpn_run = _jit(handle, 'aug_rpn', lambda v, img, shp: module.apply(
        v, img, shp, method='aug_rpn_test'))
    bbox_run = _jit(handle, 'aug_bbox', lambda v, img, p, shp: module.apply(
        v, img, p, shp, method='aug_bbox_test'))

    # ---- 1. proposals per aug, mapped back to the original frame
    ps, ss, vs = [], [], []
    for ab in aug_batches:
        p, s, v = jax.device_get(
            rpn_run(handle.variables, ab['img'], ab['img_shapes']))
        ps.append(map_boxes_back(p, ab))
        ss.append(np.asarray(s, np.float32))
        vs.append(np.asarray(v))
    cat_p = np.concatenate(ps, axis=1)
    cat_s = np.concatenate(ss, axis=1)
    cat_v = np.concatenate(vs, axis=1)

    merge_props = _jit(handle, 'merge_props', lambda bx, sc, vd: jax.vmap(
        lambda b_, s_, v_: nms(b_, s_, rpn_iou, rpn_max, valid=v_))(
        bx, sc, vd))
    mres = jax.device_get(merge_props(
        jnp.asarray(cat_p), jnp.asarray(cat_s), jnp.asarray(cat_v)))
    merged = np.asarray(mres.dets[..., :4])       # (B, P2, 4) ori frame
    merged_valid = np.asarray(mres.valid)

    # ---- 2. bbox branch per aug on the SAME merged proposals
    boxes_sum = None
    scores_sum = None
    for ab in aug_batches:
        p_aug = jnp.asarray(map_boxes_to_aug(merged, ab))
        scores, boxes = jax.device_get(bbox_run(
            handle.variables, ab['img'], p_aug, ab['img_shapes']))
        boxes = map_boxes_back(boxes, ab)
        scores = np.asarray(scores, np.float32)
        boxes_sum = boxes if boxes_sum is None else boxes_sum + boxes
        scores_sum = scores if scores_sum is None else scores_sum + scores
    boxes_m = boxes_sum / n_aug
    scores_m = scores_sum / n_aug

    final_nms = _jit(handle, 'aug_final_nms', lambda bx, sc, vd: jax.vmap(
        lambda b_, s_, v_: multiclass_nms(
            b_, jnp.where(v_[:, None], s_, 0.0), rcnn_cfg['score_thr'],
            dict(rcnn_cfg['nms']), rcnn_cfg['max_per_img']))(bx, sc, vd))
    nres = jax.device_get(final_nms(
        jnp.asarray(boxes_m), jnp.asarray(scores_m),
        jnp.asarray(merged_valid)))
    out = dict(dets=np.asarray(nres.dets), labels=np.asarray(nres.labels),
               det_valid=np.asarray(nres.valid))

    # ---- 3. mask branch per aug on the final detections
    if getattr(module, 'with_mask', False):
        mask_run = _jit(handle, 'aug_mask',
                        lambda v, img, b, l: module.apply(
                            v, img, b, l, method='aug_mask_test'))
        labels = jnp.asarray(out['labels'])
        acc = None
        for ab in aug_batches:
            db = jnp.asarray(map_boxes_to_aug(out['dets'][..., :4], ab))
            mp = np.asarray(jax.device_get(mask_run(
                handle.variables, ab['img'], db, labels)), np.float32)
            if ab.get('flip'):
                d = ab.get('flip_direction', 'horizontal')
                if d in ('horizontal', 'diagonal'):
                    mp = mp[..., ::-1]
                if d in ('vertical', 'diagonal'):
                    mp = mp[..., ::-1, :]
            acc = mp if acc is None else acc + mp
        out['mask_probs'] = acc / n_aug
    return out
