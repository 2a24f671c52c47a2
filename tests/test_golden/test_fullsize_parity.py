"""FULL-SIZE golden parity (VERDICT r2 item 6): the torch-oracle
harness at the production COCO canvas — 800x1344, 80 classes,
nms_pre=1000 / 1000 proposals — with the RPN delta branch scaled up so
decoded proposals include elongated and sliver boxes. This pins the
SR0_GMAX adaptive-sampling clamp, RoIAlign strip routing (all 4 strip
families + exact tail), and top-k tie-breaking where they actually
operate; the toy-scale e2e suite cannot reach those regimes.

Slow (CPU, several minutes): marked `slow`; run with `-m slow`.
"""
import numpy as np
import pytest
import torch

from . import refbridge
from .common import (build_both, jax_to_result, make_image,
                     run_jax_simple_test, run_ref_simple_test,
                     tiny_maskrcnn_cfg)


def match_dets(ref_res, jax_res, num_classes, score_tol=5e-3,
               box_tol=2e-2):
    """Keep-set equality, permutation-tolerant: near-tied scores may
    swap order between frameworks; each reference det must have a
    unique jax det with matching score and box."""
    ref_boxes = ref_res if isinstance(ref_res, list) else ref_res[0]
    jax_boxes = jax_res if isinstance(jax_res, list) else jax_res[0]
    for c in range(num_classes):
        r = np.asarray(ref_boxes[c]).reshape(-1, 5)
        j = np.asarray(jax_boxes[c]).reshape(-1, 5)
        assert r.shape[0] == j.shape[0], \
            f'class {c}: keep count {r.shape[0]} vs {j.shape[0]}'
        used = np.zeros(j.shape[0], bool)
        for k in range(r.shape[0]):
            d_score = np.abs(j[:, 4] - r[k, 4])
            d_box = np.abs(j[:, :4] - r[k, :4]).max(-1)
            ok = (~used) & (d_score <= score_tol) & (d_box <= box_tol)
            assert ok.any(), (f'class {c} det {k}: no jax match for '
                              f'{r[k]}')
            used[np.argmax(ok)] = True

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not refbridge.reference_available(),
                       reason='reference checkout not mounted'),
]

NUM_CLASSES = 80
HW = (800, 1344)


def _fullsize_cfg(with_mask):
    cfg = tiny_maskrcnn_cfg(num_classes=NUM_CLASSES,
                            with_mask=with_mask)
    cfg['train_cfg']['rpn_proposal'].update(nms_pre=1000,
                                            max_per_img=1000)
    # min_bbox_size=1 drops fully-degenerate border-clipped proposals
    # (an artifact of the synthetic delta amplification) on BOTH sides
    cfg['test_cfg']['rpn'].update(nms_pre=1000, max_per_img=1000,
                                  min_bbox_size=1)
    cfg['test_cfg']['rcnn'].update(max_per_img=100)
    return cfg


def _amplify_rpn_deltas(ref, scale=40.0):
    """Scale the (shared) rpn_reg weights so random-init deltas decode
    to a wide box-shape distribution — slivers, elongated and
    near-full-canvas boxes — on BOTH models (weights transfer after)."""
    with torch.no_grad():
        ref.rpn_head.rpn_reg.weight.mul_(scale)
        # per-anchor shape biases: wide slivers, tall slivers, square
        ref.rpn_head.rpn_reg.bias.add_(torch.tensor(
            [0.0, 0.0, 0.9, -1.5,
             0.0, 0.0, -1.5, 0.9,
             0.0, 0.0, 0.0, 0.0]))
        # spread the 81-way softmax so random-init scores clear the
        # 0.05 score_thr on many classes
        ref.roi_head.bbox_head.fc_cls.weight.mul_(40.0)


def _run(with_mask):
    cfg = _fullsize_cfg(with_mask)
    ref, module, variables = build_both(cfg, img_hw=HW, seed=5)
    _amplify_rpn_deltas(ref)
    from .common import transfer_weights
    variables = transfer_weights(ref, variables, cfg)
    img = make_image(*HW, seed=77)
    ref_res = run_ref_simple_test(ref, img)
    out = run_jax_simple_test(module, variables, img)
    jax_res = jax_to_result(out, NUM_CLASSES, ori_shape=(*HW, 3))
    return ref_res, jax_res


def test_faster_rcnn_fullsize_e2e():
    ref_res, jax_res = _run(with_mask=False)
    n_ref = sum(len(b) for b in ref_res)
    assert n_ref >= 50, f'oracle produced only {n_ref} detections'
    # box aspect spread proves the strip families were exercised
    allb = np.concatenate([np.asarray(b).reshape(-1, 5)
                           for b in ref_res], 0)
    w = allb[:, 2] - allb[:, 0]
    h = allb[:, 3] - allb[:, 1]
    ar = (w + 1) / (h + 1)
    assert ar.max() > 4 and ar.min() < 0.25, 'aspect spread too narrow'
    # the synthetic x40 cls amplification magnifies benign fp noise
    # ~40x; keep-set and box agreement stay strict
    match_dets(ref_res, jax_res, NUM_CLASSES)


def test_mask_rcnn_fullsize_e2e():
    ref_res, jax_res = _run(with_mask=True)
    ref_boxes, ref_masks = ref_res
    jax_boxes, jax_masks = jax_res
    n_ref = sum(len(b) for b in ref_boxes)
    assert n_ref >= 50, f'oracle produced only {n_ref} detections'
    match_dets(ref_boxes, jax_boxes, NUM_CLASSES)
    ious = []
    for c in range(NUM_CLASSES):
        assert len(ref_masks[c]) == len(jax_masks[c]), f'class {c}'
        for rm, jm in zip(ref_masks[c], jax_masks[c]):
            a = np.asarray(rm).astype(bool)
            b = np.asarray(jm).astype(bool)
            u = np.logical_or(a, b).sum()
            ious.append(np.logical_and(a, b).sum() / u if u else 1.0)
    assert np.mean(ious) >= 0.98, f'mean mask IoU {np.mean(ious):.3f}'
