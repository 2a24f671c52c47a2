"""Golden parity for test-time augmentation: our aug_test orchestration
vs the REFERENCE's aug_test (VERDICT r1 item 3).

The reference dispatches to aug_test when multiple augs are passed
(base.py:125 forward_test); it merges proposals across augs, averages
bbox scores/boxes, and averages flip-corrected mask probs
(test_mixins.py:118,238; merge_augs.py). We feed both frameworks the
same pre-augmented tensors so no resize implementation enters the diff.
"""
import numpy as np
import pytest
import torch

import cv2
import jax.numpy as jnp

from . import refbridge
from .common import (build_both, jax_to_result, make_image, match_dets,
                     tiny_maskrcnn_cfg)

pytestmark = pytest.mark.skipif(not refbridge.reference_available(),
                                reason='reference checkout not mounted')

NUM_CLASSES = 4
HW = (64, 96)


def _meta(h, w, ori, sf, flip):
    return dict(img_shape=(h, w, 3), ori_shape=(*ori, 3),
                pad_shape=(h, w, 3),
                scale_factor=np.asarray([sf, sf, sf, sf], np.float32),
                flip=flip, flip_direction='horizontal' if flip else None,
                filename='<synthetic>')


def _ref_aug_test(ref, aug_imgs, metas):
    imgs = [torch.from_numpy(
        np.ascontiguousarray(a.transpose(2, 0, 1))[None])
        for a in aug_imgs]
    with torch.no_grad():
        result = ref(imgs, [[m] for m in metas], return_loss=False,
                     rescale=True)
    return result[0]


def _jax_aug_test(module, variables, aug_imgs, metas):
    from swindet_tpu.apis.aug_test import aug_test_two_stage

    class H:  # minimal DetectorHandle stand-in
        pass

    h = H()
    h.module = module
    h.variables = variables
    h._jitted = {}
    batches = []
    for a, m in zip(aug_imgs, metas):
        hh, ww = a.shape[:2]
        batches.append(dict(
            img=jnp.asarray(a)[None],
            img_shapes=jnp.asarray([[hh, ww]], jnp.int32),
            scale_factors=jnp.asarray([m['scale_factor']]),
            flip=m['flip'],
            flip_direction=m['flip_direction'] or 'horizontal'))
    return aug_test_two_stage(h, batches)


def _mask_iou(a, b):
    a = a.astype(bool)
    b = b.astype(bool)
    u = np.logical_or(a, b).sum()
    return np.logical_and(a, b).sum() / u if u else 1.0


def _run_case(with_mask, aug_spec, seed_img=21):
    cfg = tiny_maskrcnn_cfg(num_classes=NUM_CLASSES, with_mask=with_mask)
    if not with_mask:
        cfg['type'] = 'FasterRCNN'
    ref, module, variables = build_both(cfg, img_hw=HW, seed=3)
    img = make_image(*HW, seed=seed_img)

    aug_imgs, metas = [], []
    for scale, flip in aug_spec:
        a = img
        if scale != 1.0:
            a = cv2.resize(img, (int(HW[1] * scale), int(HW[0] * scale)),
                           interpolation=cv2.INTER_LINEAR)
        if flip:
            a = np.ascontiguousarray(a[:, ::-1])
        aug_imgs.append(a.astype(np.float32))
        metas.append(_meta(a.shape[0], a.shape[1], HW, scale, flip))

    ref_res = _ref_aug_test(ref, aug_imgs, metas)
    out = _jax_aug_test(module, variables, aug_imgs, metas)
    jax_res = jax_to_result(out, NUM_CLASSES, ori_shape=(*HW, 3))
    return ref_res, jax_res


def test_aug_flip_parity():
    """orig + hflip TTA — proposal merge, score averaging, mask
    flip-back all against the reference."""
    ref_res, jax_res = _run_case(True, [(1.0, False), (1.0, True)])
    ref_boxes, ref_masks = ref_res
    jax_boxes, jax_masks = jax_res
    assert sum(len(b) for b in ref_boxes) > 0
    match_dets(ref_boxes, jax_boxes, NUM_CLASSES, box_tol=5e-2)
    for c in range(NUM_CLASSES):
        assert len(ref_masks[c]) == len(jax_masks[c]), f'class {c}'
        for rm, jm in zip(ref_masks[c], jax_masks[c]):
            assert _mask_iou(np.asarray(rm), np.asarray(jm)) >= 0.97


def test_aug_multiscale_parity():
    """two scales + flip — different canvases per aug."""
    ref_res, jax_res = _run_case(
        False, [(1.0, False), (0.5, False), (1.0, True)])
    assert sum(len(b) for b in ref_res) > 0
    match_dets(ref_res, jax_res, NUM_CLASSES, box_tol=5e-2)
