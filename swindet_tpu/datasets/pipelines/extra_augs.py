"""Augmentation breadth: Expand, MinIoURandomCrop, CutOut (reference:
mmdet/datasets/pipelines/transforms.py:916, :1008, :1741) and the
AutoAugment op set — Shear/Rotate/Translate/Color/Equalize/Brightness/
Contrast (reference: auto_augment.py:112-846).

Host-side numpy/cv2 (data pipeline runs on CPU threads); geometric ops
share one affine warp helper that transforms img + bboxes + dense masks
+ seg consistently. Masks here are dense uint8 (N, H, W) arrays, the
TPU-facing convention of this framework (see LoadAnnotations).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import cv2

from .transforms import PIPELINES

_MAX_LEVEL = 10


def level_to_value(level, max_value):
    """(reference: auto_augment.py:27)."""
    return (level / _MAX_LEVEL) * max_value


def enhance_level_to_value(level, a=1.8, b=0.1):
    """(reference: auto_augment.py:32)."""
    return (level / _MAX_LEVEL) * a + b


def _affine_warp(results, mat: np.ndarray, fill_val, out_shape=None,
                 interpolation=cv2.INTER_LINEAR,
                 min_bbox_size: float = 0.0):
    """Apply a 2x3 affine to img/bboxes/masks/seg in-place; drops gts
    whose warped box collapses (reference semantics of
    _filter_invalid, auto_augment.py:91)."""
    img = results['img']
    h, w = img.shape[:2]
    oh, ow = out_shape or (h, w)
    for key in results.get('img_fields', ['img']):
        results[key] = cv2.warpAffine(
            results[key], mat, (ow, oh), flags=interpolation,
            borderValue=tuple(fill_val))
    results['img_shape'] = results['img'].shape

    for key in results.get('bbox_fields', []):
        bboxes = results[key]
        if len(bboxes) == 0:
            continue
        # warp the 4 corners, take the axis-aligned hull (mmcv behavior)
        x1, y1, x2, y2 = bboxes[:, 0], bboxes[:, 1], bboxes[:, 2], \
            bboxes[:, 3]
        corners = np.stack([
            np.stack([x1, y1], -1), np.stack([x2, y1], -1),
            np.stack([x1, y2], -1), np.stack([x2, y2], -1)], 1)  # (N,4,2)
        ones = np.ones(corners.shape[:2] + (1,), corners.dtype)
        pts = np.concatenate([corners, ones], -1) @ mat.T        # (N,4,2)
        nx1 = pts[..., 0].min(1).clip(0, ow)
        ny1 = pts[..., 1].min(1).clip(0, oh)
        nx2 = pts[..., 0].max(1).clip(0, ow)
        ny2 = pts[..., 1].max(1).clip(0, oh)
        results[key] = np.stack([nx1, ny1, nx2, ny2], -1).astype(
            bboxes.dtype)

    for key in results.get('mask_fields', []):
        m = results[key]
        if len(m) == 0:
            results[key] = np.zeros((0, oh, ow), m.dtype)
            continue
        warped = [cv2.warpAffine(mi, mat, (ow, oh),
                                 flags=cv2.INTER_NEAREST, borderValue=0)
                  for mi in m]
        results[key] = np.stack(warped).astype(m.dtype)

    for key in results.get('seg_fields', []):
        results[key] = cv2.warpAffine(
            results[key], mat, (ow, oh), flags=cv2.INTER_NEAREST,
            borderValue=results.get('seg_ignore_label', 255))

    _filter_invalid(results, min_bbox_size)


def _filter_invalid(results, min_size: float = 0.0):
    if 'gt_bboxes' not in results:
        return
    b = results['gt_bboxes']
    valid = (b[:, 2] - b[:, 0] > min_size) & (b[:, 3] - b[:, 1] > min_size)
    if valid.all():
        return
    results['gt_bboxes'] = b[valid]
    if 'gt_labels' in results:
        results['gt_labels'] = results['gt_labels'][valid]
    if 'gt_masks' in results:
        results['gt_masks'] = results['gt_masks'][valid]


def _fill3(img_fill_val):
    if isinstance(img_fill_val, (int, float)):
        return tuple([float(img_fill_val)] * 3)
    return tuple(float(v) for v in img_fill_val)


@PIPELINES.register_module()
class Expand:
    """Place the image on a mean-filled canvas of ratio x size
    (reference: transforms.py:916)."""

    def __init__(self, mean=(0, 0, 0), to_rgb: bool = True,
                 ratio_range: Tuple[float, float] = (1, 4),
                 seg_ignore_label: Optional[int] = None,
                 prob: float = 0.5):
        self.mean = tuple(mean[::-1]) if to_rgb else tuple(mean)
        self.min_ratio, self.max_ratio = ratio_range
        self.seg_ignore_label = seg_ignore_label
        self.prob = prob

    def __call__(self, results):
        rng = results.setdefault('_rng', np.random)
        if rng.uniform(0, 1) > self.prob:
            return results
        img = results['img']
        h, w, c = img.shape
        ratio = rng.uniform(self.min_ratio, self.max_ratio)
        eh, ew = int(h * ratio), int(w * ratio)
        canvas = np.full((eh, ew, c), self.mean, dtype=img.dtype)
        left = int(rng.uniform(0, ew - w))
        top = int(rng.uniform(0, eh - h))
        canvas[top:top + h, left:left + w] = img
        results['img'] = canvas
        results['img_shape'] = canvas.shape
        for key in results.get('bbox_fields', []):
            results[key] = results[key] + np.tile(
                (left, top), 2).astype(results[key].dtype)
        for key in results.get('mask_fields', []):
            m = results[key]
            em = np.zeros((len(m), eh, ew), m.dtype)
            em[:, top:top + h, left:left + w] = m
            results[key] = em
        for key in results.get('seg_fields', []):
            seg = np.full((eh, ew), self.seg_ignore_label,
                          results[key].dtype)
            seg[top:top + h, left:left + w] = results[key]
            results[key] = seg
        return results


@PIPELINES.register_module()
class MinIoURandomCrop:
    """IoU-constrained random crop (reference: transforms.py:1008 —
    SSD-style patch sampling)."""

    def __init__(self, min_ious=(0.1, 0.3, 0.5, 0.7, 0.9),
                 min_crop_size: float = 0.3,
                 bbox_clip_border: bool = True):
        self.sample_mode = (1, *min_ious, 0)
        self.min_crop_size = min_crop_size
        self.bbox_clip_border = bbox_clip_border

    def __call__(self, results):
        from ...core.eval.mean_ap import _bbox_overlaps_np \
            as bbox_overlaps_np
        rng = results.setdefault('_rng', np.random)
        img = results['img']
        boxes = np.concatenate(
            [results[k] for k in results.get('bbox_fields', [])], 0) \
            if results.get('bbox_fields') else np.zeros((0, 4), np.float32)
        h, w = img.shape[:2]
        while True:
            mode = self.sample_mode[rng.randint(len(self.sample_mode))]
            if mode == 1:
                return results
            min_iou = mode
            for _ in range(50):
                new_w = rng.uniform(self.min_crop_size * w, w)
                new_h = rng.uniform(self.min_crop_size * h, h)
                if new_h / new_w < 0.5 or new_h / new_w > 2:
                    continue
                left = rng.uniform(0, w - new_w)
                top = rng.uniform(0, h - new_h)
                patch = np.array((int(left), int(top), int(left + new_w),
                                  int(top + new_h)))
                if patch[2] == patch[0] or patch[3] == patch[1]:
                    continue
                if len(boxes):
                    overlaps = bbox_overlaps_np(
                        patch[None].astype(np.float32),
                        boxes.astype(np.float32)).reshape(-1)
                    if overlaps.min() < min_iou:
                        continue
                    center = (boxes[:, :2] + boxes[:, 2:]) / 2
                    center_in = ((center[:, 0] > patch[0]) &
                                 (center[:, 1] > patch[1]) &
                                 (center[:, 0] < patch[2]) &
                                 (center[:, 1] < patch[3]))
                    if not center_in.any():
                        continue
                    for key in results.get('bbox_fields', []):
                        b = results[key].copy()
                        c = (b[:, :2] + b[:, 2:]) / 2
                        keep = ((c[:, 0] > patch[0]) & (c[:, 1] > patch[1])
                                & (c[:, 0] < patch[2])
                                & (c[:, 1] < patch[3]))
                        b = b[keep]
                        if self.bbox_clip_border:
                            b[:, 2:] = b[:, 2:].clip(max=patch[2:])
                            b[:, :2] = b[:, :2].clip(min=patch[:2])
                        b -= np.tile(patch[:2], 2)
                        results[key] = b
                        if key == 'gt_bboxes':
                            if 'gt_labels' in results:
                                results['gt_labels'] = \
                                    results['gt_labels'][keep]
                            if 'gt_masks' in results:
                                m = results['gt_masks'][keep]
                                results['gt_masks'] = m[
                                    :, patch[1]:patch[3],
                                    patch[0]:patch[2]]
                results['img'] = img[patch[1]:patch[3],
                                     patch[0]:patch[2]]
                results['img_shape'] = results['img'].shape
                for key in results.get('seg_fields', []):
                    results[key] = results[key][patch[1]:patch[3],
                                                patch[0]:patch[2]]
                return results


@PIPELINES.register_module()
class CutOut:
    """Randomly drop rectangular regions (reference: transforms.py:1741)."""

    def __init__(self, n_holes, cutout_shape=None, cutout_ratio=None,
                 fill_in=(0, 0, 0)):
        assert (cutout_shape is None) ^ (cutout_ratio is None)
        if not isinstance(n_holes, (tuple, list)):
            n_holes = (n_holes, n_holes)
        self.n_holes = tuple(n_holes)
        self.fill_in = fill_in
        self.with_ratio = cutout_ratio is not None
        cand = cutout_ratio if self.with_ratio else cutout_shape
        self.candidates = cand if isinstance(cand, list) else [cand]

    def __call__(self, results):
        rng = results.setdefault('_rng', np.random)
        h, w = results['img'].shape[:2]
        n = rng.randint(self.n_holes[0], self.n_holes[1] + 1)
        for _ in range(n):
            x1 = rng.randint(0, w)
            y1 = rng.randint(0, h)
            idx = rng.randint(0, len(self.candidates))
            if self.with_ratio:
                cw = int(self.candidates[idx][0] * w)
                ch = int(self.candidates[idx][1] * h)
            else:
                cw, ch = self.candidates[idx]
            x2 = np.clip(x1 + cw, 0, w)
            y2 = np.clip(y1 + ch, 0, h)
            results['img'][y1:y2, x1:x2, :] = self.fill_in
        return results


# ------------------------------------------------------ AutoAugment ops
@PIPELINES.register_module()
class Shear:
    """(reference: auto_augment.py:112)."""

    def __init__(self, level, img_fill_val=128, seg_ignore_label=255,
                 prob: float = 0.5, direction: str = 'horizontal',
                 max_shear_magnitude: float = 0.3,
                 random_negative_prob: float = 0.5,
                 interpolation: str = 'bilinear'):
        self.magnitude = level_to_value(level, max_shear_magnitude)
        self.img_fill_val = _fill3(img_fill_val)
        self.seg_ignore_label = seg_ignore_label
        self.prob = prob
        self.direction = direction
        self.random_negative_prob = random_negative_prob
        self.interpolation = (cv2.INTER_LINEAR
                              if interpolation == 'bilinear'
                              else cv2.INTER_NEAREST)

    def __call__(self, results):
        rng = results.setdefault('_rng', np.random)
        if rng.uniform(0, 1) > self.prob:
            return results
        mag = self.magnitude
        if rng.uniform(0, 1) < self.random_negative_prob:
            mag = -mag
        if self.direction == 'horizontal':
            mat = np.array([[1, mag, 0], [0, 1, 0]], np.float32)
        else:
            mat = np.array([[1, 0, 0], [mag, 1, 0]], np.float32)
        results['seg_ignore_label'] = self.seg_ignore_label
        _affine_warp(results, mat, self.img_fill_val,
                     interpolation=self.interpolation)
        return results


@PIPELINES.register_module()
class Rotate:
    """(reference: auto_augment.py:329)."""

    def __init__(self, level, scale: float = 1, center=None,
                 img_fill_val=128, seg_ignore_label=255, prob: float = 0.5,
                 max_rotate_angle: float = 30,
                 random_negative_prob: float = 0.5):
        self.angle = level_to_value(level, max_rotate_angle)
        self.scale = scale
        self.center = center
        self.img_fill_val = _fill3(img_fill_val)
        self.seg_ignore_label = seg_ignore_label
        self.prob = prob
        self.random_negative_prob = random_negative_prob

    def __call__(self, results):
        rng = results.setdefault('_rng', np.random)
        if rng.uniform(0, 1) > self.prob:
            return results
        angle = self.angle
        if rng.uniform(0, 1) < self.random_negative_prob:
            angle = -angle
        h, w = results['img'].shape[:2]
        center = self.center or ((w - 1) * 0.5, (h - 1) * 0.5)
        mat = cv2.getRotationMatrix2D(center, -angle, self.scale)
        results['seg_ignore_label'] = self.seg_ignore_label
        _affine_warp(results, mat.astype(np.float32), self.img_fill_val)
        return results


@PIPELINES.register_module()
class Translate:
    """(reference: auto_augment.py:543)."""

    def __init__(self, level, prob: float = 0.5, img_fill_val=128,
                 seg_ignore_label=255, direction: str = 'horizontal',
                 max_translate_offset: float = 250.,
                 random_negative_prob: float = 0.5,
                 min_size: float = 0.0):
        self.offset = int(level_to_value(level, max_translate_offset))
        self.prob = prob
        self.img_fill_val = _fill3(img_fill_val)
        self.seg_ignore_label = seg_ignore_label
        self.direction = direction
        self.random_negative_prob = random_negative_prob
        self.min_size = min_size

    def __call__(self, results):
        rng = results.setdefault('_rng', np.random)
        if rng.uniform(0, 1) > self.prob:
            return results
        off = self.offset
        if rng.uniform(0, 1) < self.random_negative_prob:
            off = -off
        if self.direction == 'horizontal':
            mat = np.array([[1, 0, off], [0, 1, 0]], np.float32)
        else:
            mat = np.array([[1, 0, 0], [0, 1, off]], np.float32)
        results['seg_ignore_label'] = self.seg_ignore_label
        _affine_warp(results, mat, self.img_fill_val,
                     min_bbox_size=self.min_size)
        return results


@PIPELINES.register_module()
class ColorTransform:
    """Color-balance adjust (reference: auto_augment.py:709 —
    mmcv.adjust_color: blend with the grayscale image)."""

    def __init__(self, level, prob: float = 0.5):
        self.factor = enhance_level_to_value(level)
        self.prob = prob

    def __call__(self, results):
        rng = results.setdefault('_rng', np.random)
        if rng.uniform(0, 1) > self.prob:
            return results
        img = results['img']
        gray = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_BGR2GRAY)
        gray3 = cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR).astype(np.float32)
        out = gray3 + self.factor * (img.astype(np.float32) - gray3)
        results['img'] = np.clip(out, 0, 255).astype(img.dtype)
        return results


@PIPELINES.register_module()
class EqualizeTransform:
    """Histogram equalization per channel (reference: auto_augment.py:758
    — mmcv.imequalize, PIL.ImageOps.equalize semantics)."""

    def __init__(self, prob: float = 0.5):
        self.prob = prob

    @staticmethod
    def _equalize_channel(ch: np.ndarray) -> np.ndarray:
        # PIL equalize: non-standard LUT with step = (pixels - last_bin)/255
        histo = np.bincount(ch.reshape(-1), minlength=256)
        nonzero = histo[histo > 0]
        if len(nonzero) <= 1:
            return ch
        step = (histo.sum() - nonzero[-1]) // 255
        if step == 0:
            return ch
        lut = (np.concatenate([[0], np.cumsum(histo)[:-1]]) + step // 2) \
            // step
        return np.clip(lut, 0, 255).astype(ch.dtype)[ch]

    def __call__(self, results):
        rng = results.setdefault('_rng', np.random)
        if rng.uniform(0, 1) > self.prob:
            return results
        img = results['img'].astype(np.uint8)
        results['img'] = np.stack(
            [self._equalize_channel(img[..., c])
             for c in range(img.shape[-1])], -1).astype(
                 results['img'].dtype)
        return results


@PIPELINES.register_module()
class BrightnessTransform:
    """(reference: auto_augment.py:797 — blend with a black image)."""

    def __init__(self, level, prob: float = 0.5):
        self.factor = enhance_level_to_value(level)
        self.prob = prob

    def __call__(self, results):
        rng = results.setdefault('_rng', np.random)
        if rng.uniform(0, 1) > self.prob:
            return results
        img = results['img']
        out = self.factor * img.astype(np.float32)
        results['img'] = np.clip(out, 0, 255).astype(img.dtype)
        return results


@PIPELINES.register_module()
class ContrastTransform:
    """(reference: auto_augment.py:846 — blend with the mean-gray
    image)."""

    def __init__(self, level, prob: float = 0.5):
        self.factor = enhance_level_to_value(level)
        self.prob = prob

    def __call__(self, results):
        rng = results.setdefault('_rng', np.random)
        if rng.uniform(0, 1) > self.prob:
            return results
        img = results['img']
        gray = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_BGR2GRAY)
        mean = round(gray.mean())
        out = mean + self.factor * (img.astype(np.float32) - mean)
        results['img'] = np.clip(out, 0, 255).astype(img.dtype)
        return results


# --------------------------------------------------------- corruptions
def _corrupt_image(img: np.ndarray, name: str, severity: int,
                   rng) -> np.ndarray:
    """Native implementations of the imagecorruptions benchmark formulas
    (reference: the `imagecorruptions` package the reference's Corrupt
    transform wraps, transforms.py:1555). img: uint8 BGR."""
    x = img.astype(np.float32) / 255.0
    s = severity - 1

    if name == 'gaussian_noise':
        c = [.08, .12, 0.18, 0.26, 0.38][s]
        x = x + rng.normal(size=x.shape) * c
    elif name == 'shot_noise':
        c = [60, 25, 12, 5, 3][s]
        x = rng.poisson(np.clip(x, 0, 1) * c) / float(c)
    elif name == 'impulse_noise':
        c = [.03, .06, .09, 0.17, 0.27][s]
        m = rng.rand(*x.shape[:2])
        x[m < c / 2] = 0.0
        x[(m >= c / 2) & (m < c)] = 1.0
    elif name == 'speckle_noise':
        c = [.15, .2, 0.35, 0.45, 0.6][s]
        x = x + x * rng.normal(size=x.shape) * c
    elif name == 'gaussian_blur':
        c = [1, 2, 3, 4, 6][s]
        x = cv2.GaussianBlur(x, (0, 0), c)
    elif name == 'defocus_blur':
        c = [(3, 0.1), (4, 0.5), (6, 0.5), (8, 0.5), (10, 0.5)][s]
        k = np.zeros((2 * c[0] + 1, 2 * c[0] + 1), np.float32)
        cv2.circle(k, (c[0], c[0]), c[0], 1.0, -1)
        k /= k.sum()
        x = cv2.filter2D(x, -1, k)
    elif name == 'motion_blur':
        c = [(10, 3), (15, 5), (15, 8), (15, 12), (20, 15)][s]
        k = np.zeros((c[0], c[0]), np.float32)
        k[c[0] // 2, :] = 1.0 / c[0]
        angle = rng.uniform(-45, 45)
        rot = cv2.getRotationMatrix2D((c[0] / 2, c[0] / 2), angle, 1)
        k = cv2.warpAffine(k, rot, (c[0], c[0]))
        k /= max(k.sum(), 1e-6)
        x = cv2.filter2D(x, -1, k)
    elif name == 'brightness':
        c = [.1, .2, .3, .4, .5][s]
        x = x + c
    elif name == 'contrast':
        c = [0.4, .3, .2, .1, .05][s]
        means = x.mean(axis=(0, 1), keepdims=True)
        x = (x - means) * c + means
    elif name == 'saturate':
        c = [(0.3, 0), (0.1, 0), (2, 0), (5, 0.1), (20, 0.2)][s]
        hsv = cv2.cvtColor((np.clip(x, 0, 1) * 255).astype(np.uint8),
                           cv2.COLOR_BGR2HSV).astype(np.float32)
        hsv[..., 1] = np.clip(hsv[..., 1] * c[0] + c[1] * 255, 0, 255)
        x = cv2.cvtColor(hsv.astype(np.uint8),
                         cv2.COLOR_HSV2BGR).astype(np.float32) / 255.0
    elif name == 'jpeg_compression':
        c = [25, 18, 15, 10, 7][s]
        ok, enc = cv2.imencode(
            '.jpg', img, [int(cv2.IMWRITE_JPEG_QUALITY), c])
        x = cv2.imdecode(enc, cv2.IMREAD_COLOR).astype(np.float32) / 255.
    elif name == 'pixelate':
        c = [0.6, 0.5, 0.4, 0.3, 0.25][s]
        h, w = x.shape[:2]
        small = cv2.resize(x, (max(int(w * c), 1), max(int(h * c), 1)),
                           interpolation=cv2.INTER_AREA)
        x = cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)
    else:
        raise KeyError(
            f'corruption "{name}" not implemented natively (snow/frost/'
            f'fog/glass_blur/zoom_blur/elastic need the imagecorruptions '
            f'package assets, absent from this environment)')
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


@PIPELINES.register_module()
class Corrupt:
    """Benchmark corruption transform (reference: transforms.py:1555
    Corrupt). 12 of the 15+4 imagecorruptions types implemented
    natively; see _corrupt_image for the unsupported remainder."""

    BENCHMARK = ('gaussian_noise', 'shot_noise', 'impulse_noise',
                 'defocus_blur', 'motion_blur', 'brightness', 'contrast',
                 'jpeg_compression', 'pixelate', 'gaussian_blur',
                 'speckle_noise', 'saturate')

    def __init__(self, corruption: str, severity: int = 1):
        self.corruption = corruption
        self.severity = severity

    def __call__(self, results):
        if self.severity == 0:
            return results
        rng = results.setdefault('_rng', np.random)
        results['img'] = _corrupt_image(
            results['img'].astype(np.uint8), self.corruption,
            self.severity, rng)
        return results


@PIPELINES.register_module()
class SegRescale:
    """Rescale semantic seg maps by scale_factor (reference:
    transforms.py:880 SegRescale; HTC trains the semantic branch at
    1/8 resolution)."""

    def __init__(self, scale_factor: float = 1):
        self.scale_factor = scale_factor

    def __call__(self, results):
        for key in results.get('seg_fields', []):
            if self.scale_factor != 1:
                seg = results[key]
                h = int(seg.shape[0] * self.scale_factor + 0.5)
                w = int(seg.shape[1] * self.scale_factor + 0.5)
                results[key] = cv2.resize(
                    seg, (w, h), interpolation=cv2.INTER_NEAREST)
        return results


@PIPELINES.register_module()
class RandomCenterCropPad:
    """CornerNet-style random center crop + around-padding (reference:
    transforms.py:1396). Train: pick ratio * crop_size canvas around a
    random center (centers re-drawn until at least one gt survives);
    test: center-pad to ``test_pad_mode`` shape and record ``border``."""

    def __init__(self, crop_size=None, ratios=(0.9, 1.0, 1.1),
                 border=128, mean=None, std=None, to_rgb=None,
                 test_mode=False, test_pad_mode=('logical_or', 127),
                 bbox_clip_border=True):
        self.crop_size = crop_size
        self.ratios = ratios
        self.border = border
        self.mean = np.asarray(mean if mean is not None else [0, 0, 0],
                               np.float32)
        self.test_mode = test_mode
        self.test_pad_mode = test_pad_mode
        self.bbox_clip_border = bbox_clip_border

    @staticmethod
    def _get_border(border, size):
        k = 2 * border / size
        i = pow(2, np.ceil(np.log2(np.ceil(k))) + (k == int(k)))
        return border // i

    @staticmethod
    def _filter_boxes(patch, boxes):
        c = (boxes[:, :2] + boxes[:, 2:4]) / 2
        return ((c[:, 0] > patch[0]) & (c[:, 1] > patch[1]) &
                (c[:, 0] < patch[2]) & (c[:, 1] < patch[3]))

    def _crop_paste(self, image, center, size):
        cy, cx = center
        th, tw = size
        h, w, c = image.shape
        x0 = max(0, cx - tw // 2)
        x1 = min(cx + tw // 2, w)
        y0 = max(0, cy - th // 2)
        y1 = min(cy + th // 2, h)
        patch = np.array((int(x0), int(y0), int(x1), int(y1)))
        left, right = cx - x0, x1 - cx
        top, bottom = cy - y0, y1 - cy
        ccy, ccx = th // 2, tw // 2
        out = np.empty((th, tw, c), image.dtype)
        out[:] = self.mean
        out[ccy - top:ccy + bottom, ccx - left:ccx + right] = \
            image[y0:y1, x0:x1]
        border = np.array([ccy - top, ccy + bottom, ccx - left,
                           ccx + right], np.float32)
        return out, border, patch

    def __call__(self, results):
        rng = results.setdefault('_rng', np.random)
        img = results['img']
        h, w = img.shape[:2]
        if self.test_mode or self.crop_size is None:
            mode, val = self.test_pad_mode
            if mode == 'logical_or':
                th, tw = h | val, w | val
            else:
                th = int(np.ceil(h / val)) * val
                tw = int(np.ceil(w / val)) * val
            out, border, _ = self._crop_paste(img, [h // 2, w // 2],
                                              [th, tw])
            results['img'] = out
            results['img_shape'] = out.shape
            results['pad_shape'] = out.shape
            results['border'] = border
            return results

        boxes = results.get('gt_bboxes', np.zeros((0, 4), np.float32))
        while True:
            scale = self.ratios[rng.randint(len(self.ratios))]
            new_h = int(self.crop_size[0] * scale)
            new_w = int(self.crop_size[1] * scale)
            hb = int(self._get_border(self.border, h))
            wb = int(self._get_border(self.border, w))
            for _ in range(50):
                cx = rng.randint(wb, max(w - wb, wb + 1))
                cy = rng.randint(hb, max(h - hb, hb + 1))
                out, border, patch = self._crop_paste(
                    img, [cy, cx], [new_h, new_w])
                mask = self._filter_boxes(patch, boxes)
                if len(boxes) > 0 and not mask.any():
                    continue
                results['img'] = out
                results['img_shape'] = out.shape
                results['pad_shape'] = out.shape
                x0, y0 = patch[0], patch[1]
                left_w, top_h = cx - x0, cy - y0
                ccx, ccy = new_w // 2, new_h // 2
                for key in results.get('bbox_fields', []):
                    m = self._filter_boxes(patch, results[key])
                    bb = results[key][m].copy()
                    bb[:, 0:4:2] += ccx - left_w - x0
                    bb[:, 1:4:2] += ccy - top_h - y0
                    if self.bbox_clip_border:
                        bb[:, 0:4:2] = np.clip(bb[:, 0:4:2], 0, new_w)
                        bb[:, 1:4:2] = np.clip(bb[:, 1:4:2], 0, new_h)
                    keep = (bb[:, 2] > bb[:, 0]) & (bb[:, 3] > bb[:, 1])
                    results[key] = bb[keep]
                    if key == 'gt_bboxes' and 'gt_labels' in results:
                        results['gt_labels'] = \
                            results['gt_labels'][m][keep]
                return results


@PIPELINES.register_module()
class LoadProposals:
    """Load externally-computed proposals (reference: pipelines/
    loading.py:388) — Fast R-CNN style training."""

    def __init__(self, num_max_proposals=None):
        self.num_max_proposals = num_max_proposals

    def __call__(self, results):
        proposals = np.asarray(results['proposals'], np.float32)
        if proposals.shape[1] not in (4, 5):
            raise AssertionError(
                'proposals should have shapes (n, 4) or (n, 5), '
                f'but found {proposals.shape}')
        proposals = proposals[:, :4]
        if self.num_max_proposals is not None:
            proposals = proposals[:self.num_max_proposals]
        if len(proposals) == 0:
            proposals = np.array([[0, 0, 0, 0]], np.float32)
        results['proposals'] = proposals
        results.setdefault('bbox_fields', []).append('proposals')
        return results


@PIPELINES.register_module()
class LoadMultiChannelImageFromFiles:
    """Stack several single-channel files into one multi-channel image
    (reference: pipelines/loading.py:310)."""

    def __init__(self, to_float32=False, color_type='unchanged'):
        self.to_float32 = to_float32
        self.color_type = color_type

    def __call__(self, results):
        import cv2
        import os.path as osp
        prefix = results.get('img_prefix')
        files = results['img_info']['filename']
        imgs = []
        for name in files:
            path = osp.join(prefix, name) if prefix else name
            flag = (cv2.IMREAD_UNCHANGED
                    if self.color_type == 'unchanged'
                    else cv2.IMREAD_COLOR)
            imgs.append(cv2.imread(path, flag))
        img = np.stack(imgs, axis=-1)
        if self.to_float32:
            img = img.astype(np.float32)
        results['filename'] = files
        results['img'] = img
        results['img_shape'] = img.shape
        results['ori_shape'] = img.shape
        results.setdefault('img_fields', ['img'])
        return results


@PIPELINES.register_module()
class Albu:
    """albumentations bridge (reference: pipelines/transforms.py Albu).
    The package is optional; construction only stores the config and
    the first __call__ raises a clear error when albumentations is
    absent (keeps Albu-using configs loadable everywhere)."""

    def __init__(self, transforms, bbox_params=None, keymap=None,
                 update_pad_shape=False, skip_img_without_anno=False):
        self.transforms = transforms
        self.bbox_params = bbox_params
        self.keymap_to_albu = keymap or dict(img='image',
                                             gt_masks='masks',
                                             gt_bboxes='bboxes')
        self.keymap_back = {v: k for k, v in self.keymap_to_albu.items()}
        self.update_pad_shape = update_pad_shape
        self.skip_img_without_anno = skip_img_without_anno
        self._aug = None

    def _build(self):
        try:
            import albumentations as A
        except ImportError as e:
            raise ImportError(
                'Albu transform requires the optional `albumentations` '
                'package (not bundled in this environment)') from e

        def build_t(cfg):
            cfg = dict(cfg)
            t = getattr(A, cfg.pop('type'))
            if 'transforms' in cfg:
                cfg['transforms'] = [build_t(c)
                                     for c in cfg['transforms']]
            return t(**cfg)

        bbox_params = None
        if self.bbox_params is not None:
            bp = dict(self.bbox_params)
            bp.pop('type', None)
            import albumentations as A
            bbox_params = A.BboxParams(**bp)
        self._aug = __import__('albumentations').Compose(
            [build_t(t) for t in self.transforms],
            bbox_params=bbox_params)

    def __call__(self, results):
        if self._aug is None:
            self._build()
        mapped = {self.keymap_to_albu.get(k, k): v
                  for k, v in results.items()
                  if k in self.keymap_to_albu or k == 'img'}
        out = self._aug(**{k: v for k, v in mapped.items()
                           if k in ('image', 'masks', 'bboxes')})
        for k, v in out.items():
            results[self.keymap_back.get(k, k)] = (
                np.asarray(v, np.float32) if k == 'bboxes' else v)
        results['img_shape'] = results['img'].shape
        if self.update_pad_shape:
            results['pad_shape'] = results['img'].shape
        return results


@PIPELINES.register_module()
class InstaBoost:
    """Instance-level copy-paste augmentation (reference:
    mmdet/datasets/pipelines/instaboost.py; arXiv:1908.07801).

    Thin adapter over the optional ``instaboostfast`` package (not
    baked into this image) — building the pipeline is always allowed so
    configs/instaboost/* load; calling it without the package raises a
    clear ImportError, and with ``aug_ratio`` the augmentation is
    applied stochastically exactly as the reference does."""

    def __init__(self, action_candidate=('normal', 'horizontal', 'skip'),
                 action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15, dy=15,
                 theta=(-1, 1), color_prob=0.5, hflag=False,
                 aug_ratio=0.5):
        self.aug_ratio = aug_ratio
        self._cfg_args = dict(action_candidate=action_candidate,
                              action_prob=action_prob, scale=scale,
                              dx=dx, dy=dy, theta=theta,
                              color_prob=color_prob, hflag=hflag)
        self._cfg = None

    def __call__(self, results):
        if np.random.rand() > self.aug_ratio:
            return results
        try:
            import instaboostfast as instaboost
        except ImportError as e:
            raise ImportError(
                'InstaBoost requires the "instaboostfast" package, '
                'which is not installed in this environment') from e
        if self._cfg is None:
            self._cfg = instaboost.InstaBoostConfig(**self._cfg_args)
        anns = results.get('ann_info', {}).get('raw_anns')
        if anns is None:
            return results
        anns, img = instaboost.get_new_data(
            anns, results['img'].astype(np.uint8), self._cfg,
            background=None)
        results['img'] = img.astype(np.float32)
        results['ann_info']['raw_anns'] = anns
        return results
