"""VOC-style mAP (reference: mmdet/core/evaluation/mean_ap.py:267
eval_map — per-class PR curves with area/11-point interpolation, crowd
ignore handling). Pure numpy host-side evaluation.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def _bbox_overlaps_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU matrix (numpy, xyxy)."""
    if a.size == 0 or b.size == 0:
        return np.zeros((len(a), len(b)), np.float32)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:4], b[None, :, 2:4])
    inter = np.prod(np.clip(br - tl, 0, None), axis=2)
    area_a = np.prod(a[:, 2:4] - a[:, :2], axis=1)
    area_b = np.prod(b[:, 2:4] - b[:, :2], axis=1)
    union = area_a[:, None] + area_b[None] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-10), 0.0)


def average_precision(recalls: np.ndarray, precisions: np.ndarray,
                      mode: str = 'area') -> float:
    """(reference: mean_ap.py:12)."""
    recalls = recalls[None] if recalls.ndim == 1 else recalls
    precisions = precisions[None] if precisions.ndim == 1 else precisions
    num_scales = recalls.shape[0]
    ap = np.zeros(num_scales, np.float32)
    if mode == 'area':
        zeros = np.zeros((num_scales, 1), recalls.dtype)
        ones = np.ones((num_scales, 1), recalls.dtype)
        mrec = np.hstack((zeros, recalls, ones))
        mpre = np.hstack((zeros, precisions, zeros))
        for i in range(mpre.shape[1] - 1, 0, -1):
            mpre[:, i - 1] = np.maximum(mpre[:, i - 1], mpre[:, i])
        for i in range(num_scales):
            ind = np.where(mrec[i, 1:] != mrec[i, :-1])[0]
            ap[i] = np.sum(
                (mrec[i, ind + 1] - mrec[i, ind]) * mpre[i, ind + 1])
    elif mode == '11points':
        for i in range(num_scales):
            for thr in np.arange(0, 1 + 1e-3, 0.1):
                precs = precisions[i, recalls[i, :] >= thr]
                ap[i] += precs.max() if precs.size > 0 else 0
        ap /= 11
    else:
        raise ValueError(f'unknown mode {mode}')
    return ap if ap.size > 1 else float(ap[0])


def tpfp_default(det_bboxes: np.ndarray, gt_bboxes: np.ndarray,
                 gt_bboxes_ignore: Optional[np.ndarray],
                 iou_thr: float = 0.5):
    """Mark each det as tp/fp (reference: mean_ap.py:26 tpfp_default)."""
    num_dets = det_bboxes.shape[0]
    num_gts = gt_bboxes.shape[0]
    tp = np.zeros(num_dets, np.float32)
    fp = np.zeros(num_dets, np.float32)
    if gt_bboxes_ignore is None:
        gt_bboxes_ignore = np.zeros((0, 4), np.float32)
    if num_gts == 0 and len(gt_bboxes_ignore) == 0:
        fp[...] = 1
        return tp, fp
    if num_dets == 0:
        return tp, fp
    ious = _bbox_overlaps_np(det_bboxes[:, :4], gt_bboxes)
    ious_ignore = _bbox_overlaps_np(det_bboxes[:, :4], gt_bboxes_ignore)
    ious_max = ious.max(axis=1) if num_gts else np.zeros(num_dets)
    ious_argmax = ious.argmax(axis=1) if num_gts else \
        np.zeros(num_dets, int)
    sort_inds = np.argsort(-det_bboxes[:, -1], kind='mergesort')
    gt_covered = np.zeros(num_gts, bool)
    for i in sort_inds:
        if num_gts and ious_max[i] >= iou_thr:
            matched = ious_argmax[i]
            if not gt_covered[matched]:
                gt_covered[matched] = True
                tp[i] = 1
            else:
                fp[i] = 1
        elif ious_ignore.shape[1] and \
                ious_ignore[i].max() >= iou_thr:
            pass  # ignored — neither tp nor fp
        else:
            fp[i] = 1
    return tp, fp


def eval_map(det_results: List[List[np.ndarray]],
             annotations: List[dict],
             iou_thr: float = 0.5,
             logger=None,
             nproc: int = 4) -> Tuple[float, List[dict]]:
    """(reference: mean_ap.py:267). det_results[i][c] = (n, 5) dets of
    class c in image i; annotations[i] = dict(bboxes, labels
    [, bboxes_ignore, labels_ignore])."""
    num_imgs = len(det_results)
    num_classes = len(det_results[0])
    eval_results = []
    for c in range(num_classes):
        cls_dets = [det_results[i][c] for i in range(num_imgs)]
        cls_gts, cls_gts_ignore = [], []
        for ann in annotations:
            gt_inds = ann['labels'] == c
            cls_gts.append(ann['bboxes'][gt_inds, :4])
            if ann.get('labels_ignore') is not None and \
                    len(ann.get('labels_ignore', ())) > 0:
                ig_inds = ann['labels_ignore'] == c
                cls_gts_ignore.append(ann['bboxes_ignore'][ig_inds, :4])
            elif ann.get('bboxes_ignore') is not None:
                cls_gts_ignore.append(
                    np.asarray(ann['bboxes_ignore'])[:, :4]
                    if len(ann['bboxes_ignore']) else
                    np.zeros((0, 4), np.float32))
            else:
                cls_gts_ignore.append(np.zeros((0, 4), np.float32))
        tpfp = [tpfp_default(cls_dets[i], cls_gts[i],
                             cls_gts_ignore[i], iou_thr)
                for i in range(num_imgs)]
        tp_list, fp_list = tuple(zip(*tpfp))
        num_gts = sum(len(g) for g in cls_gts)
        all_dets = np.vstack(cls_dets)
        num_dets = all_dets.shape[0]
        sort_inds = np.argsort(-all_dets[:, -1], kind='mergesort')
        tp = np.concatenate(tp_list)[sort_inds]
        fp = np.concatenate(fp_list)[sort_inds]
        tp = np.cumsum(tp)
        fp = np.cumsum(fp)
        eps = np.finfo(np.float32).eps
        recalls = tp / max(num_gts, eps)
        precisions = tp / np.maximum(tp + fp, eps)
        ap = average_precision(recalls, precisions, 'area') \
            if num_dets > 0 and num_gts > 0 else 0.0
        eval_results.append(dict(
            num_gts=num_gts, num_dets=num_dets,
            recall=recalls[-1] if num_dets and num_gts else 0.0,
            precision=precisions[-1] if num_dets else 0.0,
            ap=float(ap)))
    aps = [r['ap'] for r in eval_results if r['num_gts'] > 0]
    mean_ap = float(np.mean(aps)) if aps else 0.0
    if logger is not None and logger != 'silent':
        logger.info(f'mAP@{iou_thr}: {mean_ap:.4f}')
    return mean_ap, eval_results


def eval_recalls(gts: List[np.ndarray], proposals: List[np.ndarray],
                 proposal_nums: Sequence[int] = (100, 300, 1000),
                 iou_thrs: Sequence[float] = (0.5,),
                 logger=None) -> np.ndarray:
    """Proposal recall matrix (reference: recall.py:64 eval_recalls)."""
    img_num = len(gts)
    assert img_num == len(proposals)
    proposal_nums = np.asarray(proposal_nums, int)
    iou_thrs = np.asarray(iou_thrs)
    all_ious = []
    for i in range(img_num):
        prop = proposals[i]
        if prop.shape[1] == 5:
            prop = prop[np.argsort(-prop[:, 4], kind='mergesort')][:, :4]
        img_ious = []
        for pn in proposal_nums:
            if gts[i].size == 0 or prop.size == 0:
                ious = np.zeros((0, pn), np.float32)
            else:
                ious = _bbox_overlaps_np(gts[i][:, :4], prop[:pn])
            img_ious.append(ious)
        all_ious.append(img_ious)
    recalls = np.zeros((len(proposal_nums), len(iou_thrs)))
    for pi in range(len(proposal_nums)):
        tmp_ious = np.zeros(0)
        for i in range(img_num):
            ious = all_ious[i][pi]
            gt_ious = ious.max(axis=1) if ious.size else \
                np.zeros(ious.shape[0])
            tmp_ious = np.concatenate([tmp_ious, gt_ious])
        for ti, thr in enumerate(iou_thrs):
            recalls[pi, ti] = (tmp_ious >= thr).mean() \
                if tmp_ious.size else 0.0
    return recalls
