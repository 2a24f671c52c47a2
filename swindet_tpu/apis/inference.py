"""Python inference API (reference: mmdet/apis/inference.py:16,89 —
init_detector / inference_detector / show_result_pyplot).

TPU-native shape discipline: the test pipeline output is padded onto a
fixed canvas per scale bucket, so every image of a given test scale hits
ONE jit-compiled program; the only host steps are JPEG decode/resize and
final mask pasting + formatting.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..models import build_detector
from ..utils import Config
from ..core.bbox.transforms import bbox2result
from ..core.masks import paste_masks
from ..datasets.pipelines.transforms import Compose, PIPELINES
from ..utils.registry import build_from_cfg


class DetectorHandle:
    """Bundles module + params + cfg + jit cache (the functional stand-in
    for the reference's nn.Module-with-weights)."""

    def __init__(self, cfg: Config, module, variables, CLASSES=None):
        self.cfg = cfg
        self.module = module
        self.variables = variables
        self.CLASSES = CLASSES
        self._jitted = {}

    def jitted_simple_test(self):
        if 'simple_test' not in self._jitted:
            def run(variables, img, img_shapes, scale_factors):
                return self.module.apply(variables, img, img_shapes,
                                         scale_factors,
                                         method='simple_test')
            self._jitted['simple_test'] = jax.jit(run)
        return self._jitted['simple_test']


def init_detector(config: Union[str, Config],
                  checkpoint: Optional[str] = None,
                  device: Optional[str] = None,
                  cfg_options: Optional[dict] = None,
                  seed: int = 0) -> DetectorHandle:
    """Build a detector from config (+ optional checkpoint)
    (reference: apis/inference.py:16)."""
    if isinstance(config, str):
        config = Config.fromfile(config)
    if cfg_options is not None:
        config.merge_from_dict(cfg_options)
    model_cfg = config.model.copy()
    model_cfg.pop('pretrained', None)
    module = build_detector(model_cfg.to_dict()
                            if hasattr(model_cfg, 'to_dict')
                            else dict(model_cfg))

    # init params on a small dummy canvas
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    from ..utils import jit_init
    variables = jit_init(module, {'params': jax.random.PRNGKey(seed)},
                         dummy, method='forward_dummy')
    classes = None
    if checkpoint is not None:
        from ..checkpoint import load_checkpoint
        variables, meta = load_checkpoint(module, variables, checkpoint)
        classes = meta.get('CLASSES')
    if classes is None:
        from ..core.eval.class_names import get_classes
        classes = get_classes('coco')
    return DetectorHandle(config, module, variables, CLASSES=classes)


def _build_test_pipeline(cfg: Config) -> Tuple[Compose, dict]:
    pipeline_cfg = [dict(p) for p in cfg.data.test.pipeline]
    # skip the initial load step; we feed ndarray/np paths explicitly
    assert pipeline_cfg[0]['type'] in ('LoadImageFromFile',
                                       'LoadImageFromWebcam')
    tta = None
    steps = []
    for p in pipeline_cfg[1:]:
        if p['type'] == 'MultiScaleFlipAug':
            tta = p
        else:
            steps.append(p)
    if tta is not None:
        return Compose([dict(t) for t in tta['transforms']]), tta
    return Compose(steps), dict(img_scale=[None])


def _canvas_for(scale: Tuple[int, int], divisor: int = 32) -> Tuple[int, int]:
    """Static canvas covering any keep_ratio resize to ``scale``."""
    long_e, short_e = max(scale), min(scale)
    rup = lambda v: (v + divisor - 1) // divisor * divisor
    return rup(short_e), rup(long_e)


def preprocess_images(imgs: Sequence[Union[str, np.ndarray]],
                      cfg: Config) -> Dict[str, Any]:
    """Run the test pipeline and pad to the scale bucket's fixed canvas.
    Returns device-ready batch + per-image meta."""
    pipeline, tta_cfg = _build_test_pipeline(cfg)
    scale = tta_cfg.get('img_scale')
    scale = scale[0] if isinstance(scale, list) else scale

    processed = []
    for img in imgs:
        if isinstance(img, str):
            results = dict(img_info=dict(filename=img), img_prefix=None)
            from ..datasets.pipelines.transforms import LoadImageFromFile
            results = LoadImageFromFile()(results)
        else:
            results = dict(img=img, img_shape=img.shape,
                           ori_shape=img.shape, img_fields=['img'])
        if scale is not None:
            results['scale'] = tuple(scale)
        results['flip'] = False
        results['flip_direction'] = 'horizontal'
        processed.append(pipeline(results))

    if scale is not None:
        ch, cw = _canvas_for(scale)
    else:
        ch = max(r['img'].shape[0] for r in processed)
        cw = max(r['img'].shape[1] for r in processed)
        ch = (ch + 31) // 32 * 32
        cw = (cw + 31) // 32 * 32
    # orientation: canvas must cover both landscape & portrait resizes
    if any(r['img'].shape[0] > ch or r['img'].shape[1] > cw
           for r in processed):
        ch = cw = max(ch, cw)

    b = len(processed)
    img_batch = np.zeros((b, ch, cw, 3), np.float32)
    img_shapes = np.zeros((b, 2), np.int32)
    scale_factors = np.ones((b, 4), np.float32)
    metas = []
    for i, r in enumerate(processed):
        meta = r.get('img_metas', r)  # Collect nests metas
        h, w = r['img'].shape[:2]
        img_batch[i, :h, :w] = r['img']
        img_shapes[i] = (h, w)
        scale_factors[i] = meta.get('scale_factor',
                                    np.ones(4, np.float32))
        metas.append(dict(ori_shape=meta['ori_shape'],
                          img_shape=(h, w),
                          scale_factor=scale_factors[i]))
    return dict(img=jnp.asarray(img_batch),
                img_shapes=jnp.asarray(img_shapes),
                scale_factors=jnp.asarray(scale_factors),
                metas=metas)


def format_results(outputs: Dict[str, np.ndarray], metas: List[dict],
                   num_classes: int, mask_thr: float = 0.5,
                   with_mask: Optional[bool] = None):
    """Padded device outputs → reference result format: per image
    (list[num_classes] of (k, 5) arrays[, list[num_classes] of masks])."""
    dets = np.asarray(outputs['dets'])
    labels = np.asarray(outputs['labels'])
    valid = np.asarray(outputs['det_valid'])
    full_res = 'mask_probs_full' in outputs
    has_mask = ('mask_probs' in outputs or full_res) \
        if with_mask is None else with_mask
    if has_mask:
        mask_probs = np.asarray(
            outputs['mask_probs_full' if full_res else 'mask_probs'])

    results = []
    for i, meta in enumerate(metas):
        bbox_res = bbox2result(dets[i], labels[i], num_classes, valid[i])
        if not has_mask:
            results.append(bbox_res)
            continue
        oh, ow = meta['ori_shape'][:2]
        v = valid[i]
        if full_res:
            # YOLACT: whole-frame proto-res masks — bilinear to ori
            # shape + threshold (reference yolact_head.py:852
            # F.interpolate align_corners=False == cv2 INTER_LINEAR)
            import cv2
            pm = np.stack([
                cv2.resize(m.astype(np.float32), (ow, oh),
                           interpolation=cv2.INTER_LINEAR) > mask_thr
                for m in mask_probs[i][v]]).astype(np.uint8) \
                if v.any() else np.zeros((0, oh, ow), np.uint8)
        else:
            pm = paste_masks(mask_probs[i][v], dets[i][v, :4], oh, ow,
                             threshold=mask_thr)
        mask_res = [[] for _ in range(num_classes)]
        for m, lab in zip(pm, labels[i][v]):
            mask_res[int(lab)].append(m)
        results.append((bbox_res, mask_res))
    return results


def _load_raw(img: Union[str, np.ndarray]) -> dict:
    if isinstance(img, str):
        from ..datasets.pipelines.transforms import LoadImageFromFile
        return LoadImageFromFile()(dict(img_info=dict(filename=img),
                                        img_prefix=None))
    return dict(img=img, img_shape=img.shape, ori_shape=img.shape,
                img_fields=['img'])


def inference_detector(model: DetectorHandle,
                       imgs: Union[str, np.ndarray, Sequence],
                       tta: bool = False):
    """Run inference on image(s) (reference: apis/inference.py:89).
    Accepts path(s) or BGR ndarray(s); returns reference-format results.
    ``tta=True`` consumes every MultiScaleFlipAug output through the
    merge_augs path (reference base.py:125 aug_test dispatch)."""
    single = isinstance(imgs, (str, np.ndarray))
    if single:
        imgs = [imgs]
    num_classes = len(model.CLASSES)
    mask_thr = dict(model.cfg.model.test_cfg.rcnn).get('mask_thr_binary',
                                                       0.5) \
        if 'rcnn' in model.cfg.model.test_cfg else 0.5

    if tta and hasattr(model.module, 'aug_rpn_test'):
        from ..datasets.pipelines.transforms import MultiScaleFlipAug
        pipeline_cfg = [dict(p) for p in model.cfg.data.test.pipeline]
        tta_cfg = next((p for p in pipeline_cfg
                        if p['type'] == 'MultiScaleFlipAug'), None)
        if tta_cfg is not None:
            tta_cfg = dict(tta_cfg)
            tta_cfg.pop('type')
            fan = MultiScaleFlipAug(**tta_cfg)
            processed = [fan(_load_raw(im)) for im in imgs]
            n_aug = len(processed[0]['img'])
            if n_aug > 1:
                from .aug_test import aug_test_two_stage
                b = len(processed)
                aug_batches = []
                metas = [dict(ori_shape=p['ori_shape'][0],
                              img_shape=p['img'][0].shape[:2],
                              scale_factor=np.ones(4, np.float32))
                         for p in processed]
                for a in range(n_aug):
                    ch = _canvas_max(processed, a, 0)
                    cw = _canvas_max(processed, a, 1)
                    img = np.zeros((b, ch, cw, 3), np.float32)
                    shapes = np.ones((b, 2), np.int32)
                    sfs = np.ones((b, 4), np.float32)
                    for j, p in enumerate(processed):
                        im = p['img'][a]
                        h, w = im.shape[:2]
                        img[j, :h, :w] = im
                        shapes[j] = (h, w)
                        sfs[j] = p['scale_factor'][a]
                    aug_batches.append(dict(
                        img=jnp.asarray(img),
                        img_shapes=jnp.asarray(shapes),
                        scale_factors=jnp.asarray(sfs),
                        flip=bool(processed[0]['flip'][a]),
                        flip_direction=processed[0]['flip_direction'][a]
                        or 'horizontal'))
                out = aug_test_two_stage(model, aug_batches)
                results = format_results(out, metas, num_classes,
                                         mask_thr)
                return results[0] if single else results

    batch = preprocess_images(imgs, model.cfg)
    run = model.jitted_simple_test()
    out = run(model.variables, batch['img'], batch['img_shapes'],
              batch['scale_factors'])
    out = jax.device_get(out)
    results = format_results(out, batch['metas'], num_classes, mask_thr)
    return results[0] if single else results


async def async_inference_detector(model: DetectorHandle,
                                   imgs: Union[str, np.ndarray, Sequence]):
    """Async inference for concurrent streams (reference:
    apis/inference.py:155 async_inference_detector).

    TPU-native shape: JAX dispatch is already asynchronous — the jitted
    call only enqueues device work — so the awaits wrap the two HOST
    stages (cv2 preprocessing and the device→host readback) in executor
    threads, letting the event loop interleave other requests while the
    chip computes."""
    import asyncio
    loop = asyncio.get_running_loop()
    single = isinstance(imgs, (str, np.ndarray))
    if single:
        imgs = [imgs]
    batch = await loop.run_in_executor(None, preprocess_images, imgs,
                                       model.cfg)
    run = model.jitted_simple_test()
    out = run(model.variables, batch['img'], batch['img_shapes'],
              batch['scale_factors'])
    out = await loop.run_in_executor(None, jax.device_get, out)
    num_classes = len(model.CLASSES)
    mask_thr = dict(model.cfg.model.test_cfg.rcnn).get(
        'mask_thr_binary', 0.5) \
        if 'rcnn' in model.cfg.model.test_cfg else 0.5
    results = format_results(out, batch['metas'], num_classes, mask_thr)
    return results[0] if single else results


def _canvas_max(processed, a, dim, divisor: int = 32) -> int:
    v = max(p['img'][a].shape[dim] for p in processed)
    return (v + divisor - 1) // divisor * divisor


def show_result(img: Union[str, np.ndarray], result, classes,
                score_thr: float = 0.3, out_file: Optional[str] = None):
    """Draw boxes (+ masks) on the image (reference: base.py:270
    show_result). Returns the BGR ndarray."""
    import cv2
    if isinstance(img, str):
        img = cv2.imread(img)
    img = img.copy()
    bbox_res, mask_res = (result if isinstance(result, tuple)
                          else (result, None))
    rng = np.random.RandomState(42)
    colors = rng.randint(0, 256, (len(classes), 3)).tolist()
    for cls_id, dets in enumerate(bbox_res):
        for j, det in enumerate(dets):
            if det[4] < score_thr:
                continue
            x1, y1, x2, y2 = det[:4].astype(int)
            color = tuple(int(c) for c in colors[cls_id])
            cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
            label = f'{classes[cls_id]} {det[4]:.2f}'
            cv2.putText(img, label, (x1, max(y1 - 4, 0)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
            if mask_res is not None and j < len(mask_res[cls_id]):
                m = mask_res[cls_id][j]
                img[m] = img[m] * 0.5 + np.array(color) * 0.5
    if out_file:
        cv2.imwrite(out_file, img)
    return img


def imshow_gt_det_bboxes(img: Union[str, np.ndarray], annotation: dict,
                         result, class_names=None,
                         score_thr: float = 0.0,
                         gt_color=(61, 102, 255),
                         det_color=(241, 101, 72),
                         thickness: int = 2,
                         out_file: Optional[str] = None):
    """GT-vs-detection comparison panel (reference:
    mmdet/core/visualization/image.py:189 imshow_gt_det_bboxes).

    Draws the ground-truth boxes/masks (orange, BGR gt_color) and the
    detections above ``score_thr`` (blue, BGR det_color) on one canvas
    so misses/false-positives are visible at a glance. ``annotation``
    needs 'gt_bboxes' (G, 4) and 'gt_labels' (G,), optionally
    'gt_masks' (G, H, W). ``result`` is the per-class list format that
    inference returns. Returns the BGR ndarray."""
    import cv2
    if isinstance(img, str):
        img = cv2.imread(img)
    img = img.copy().astype(np.uint8)

    gt_bboxes = np.asarray(annotation['gt_bboxes'])
    gt_labels = np.asarray(annotation['gt_labels'])
    gt_masks = annotation.get('gt_masks')
    for g in range(len(gt_bboxes)):
        x1, y1, x2, y2 = gt_bboxes[g, :4].astype(int)
        cv2.rectangle(img, (x1, y1), (x2, y2), gt_color, thickness)
        name = (class_names[int(gt_labels[g])] if class_names
                else str(int(gt_labels[g])))
        cv2.putText(img, f'GT:{name}', (x1, max(y1 - 4, 0)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, gt_color, 1)
        if gt_masks is not None:
            m = np.asarray(gt_masks[g]) > 0.5
            m = m[:img.shape[0], :img.shape[1]]
            img[m] = img[m] * 0.5 + np.array(gt_color) * 0.5

    bbox_res, mask_res = (result if isinstance(result, tuple)
                          else (result, None))
    for cls_id, dets in enumerate(bbox_res):
        for j, det in enumerate(np.asarray(dets)):
            if det[4] < score_thr:
                continue
            x1, y1, x2, y2 = det[:4].astype(int)
            cv2.rectangle(img, (x1, y1), (x2, y2), det_color, thickness)
            name = class_names[cls_id] if class_names else str(cls_id)
            cv2.putText(img, f'{name} {det[4]:.2f}',
                        (x1, min(y2 + 14, img.shape[0] - 2)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, det_color, 1)
            if mask_res is not None and j < len(mask_res[cls_id]):
                m = np.asarray(mask_res[cls_id][j]) > 0.5
                img[m] = img[m] * 0.5 + np.array(det_color) * 0.5
    if out_file:
        cv2.imwrite(out_file, img)
    return img
