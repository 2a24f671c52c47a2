"""Data pipeline transforms (host side, numpy/cv2).

Re-implements the reference pipeline semantics (reference:
mmdet/datasets/pipelines/transforms.py — Resize:26, RandomFlip:319,
Pad:476, Normalize:547, RandomCrop:588; auto_augment.py:46;
test_time_aug.py:10; compose.py:9; loading.py). These run in host worker
threads; the device side consumes fixed padded canvases (see
datasets/builder.py bucketing).

results dict keys follow the reference: img, img_shape, ori_shape,
pad_shape, scale_factor, img_norm_cfg, gt_bboxes, gt_labels, gt_masks
(numpy (G, H, W) uint8), gt_bboxes_ignore.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from ...utils.registry import build_from_cfg
from ...registries import PIPELINES


def _imread(path: str) -> np.ndarray:
    if os.environ.get('SWINDET_NATIVE_IMAGE') == '1':
        # native libjpeg/libpng decode (image_ops.cpp) — GIL-free;
        # opt-in because IDCT rounding may differ from cv2 by ±1 LSB
        from ... import native
        if native.image_available():
            try:
                return native.image_decode(path)
            except (IOError, OSError):
                pass  # non-JPEG/PNG container → cv2
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f'cannot read image {path}')
    return img  # BGR uint8


def _imresize(img: np.ndarray, size_wh: Tuple[int, int],
              interpolation: str = 'bilinear') -> np.ndarray:
    import cv2
    interp = {'bilinear': cv2.INTER_LINEAR, 'nearest': cv2.INTER_NEAREST,
              'bicubic': cv2.INTER_CUBIC, 'area': cv2.INTER_AREA}
    return cv2.resize(img, size_wh, interpolation=interp[interpolation])


def rescale_size(old_wh: Tuple[int, int],
                 scale: Union[float, Tuple[int, int]]) -> Tuple[int, int]:
    """mmcv rescale_size: scale tuple = (long, short) order-independent."""
    w, h = old_wh
    if isinstance(scale, (int, float)):
        f = scale
    else:
        max_long, max_short = max(scale), min(scale)
        f = min(max_long / max(h, w), max_short / min(h, w))
    return int(w * f + 0.5), int(h * f + 0.5)


@PIPELINES.register_module()
class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = []
        for t in transforms:
            if isinstance(t, dict):
                self.transforms.append(build_from_cfg(dict(t), PIPELINES))
            else:
                self.transforms.append(t)

    def __call__(self, results: Optional[Dict]) -> Optional[Dict]:
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results

    def __repr__(self):
        return 'Compose(' + ', '.join(map(repr, self.transforms)) + ')'


@PIPELINES.register_module()
class LoadImageFromFile:
    """(reference: loading.py:12)."""

    def __init__(self, to_float32: bool = False,
                 color_type: str = 'color', **kwargs):
        self.to_float32 = to_float32

    def __call__(self, results):
        info = results['img_info']
        prefix = results.get('img_prefix')
        filename = (osp.join(prefix, info['filename']) if prefix
                    else info['filename'])
        img = _imread(filename)
        if self.to_float32:
            img = img.astype(np.float32)
        results['filename'] = filename
        results['ori_filename'] = info['filename']
        results['img'] = img
        results['img_shape'] = img.shape
        results['ori_shape'] = img.shape
        results['img_fields'] = ['img']
        return results


@PIPELINES.register_module()
class LoadImageFromWebcam(LoadImageFromFile):
    """(reference: loading.py:81) — image already in results['img']."""

    def __call__(self, results):
        img = results['img']
        if self.to_float32:
            img = img.astype(np.float32)
        results['filename'] = None
        results['ori_filename'] = None
        results['img'] = img
        results['img_shape'] = img.shape
        results['ori_shape'] = img.shape
        results['img_fields'] = ['img']
        return results


@PIPELINES.register_module()
class LoadAnnotations:
    """(reference: loading.py:196). Masks are rasterised to bitmaps
    immediately (poly2mask) — TPU consumes dense arrays."""

    def __init__(self, with_bbox: bool = True, with_label: bool = True,
                 with_mask: bool = False, with_seg: bool = False,
                 poly2mask: bool = True, **kwargs):
        self.with_bbox = with_bbox
        self.with_label = with_label
        self.with_mask = with_mask
        self.with_seg = with_seg

    def __call__(self, results):
        ann = results['ann_info']
        if self.with_bbox:
            results['gt_bboxes'] = ann['bboxes'].astype(np.float32).copy()
            results['bbox_fields'] = ['gt_bboxes']
            ignore = ann.get('bboxes_ignore')
            if ignore is not None:
                results['gt_bboxes_ignore'] = \
                    ignore.astype(np.float32).copy()
                results['bbox_fields'].append('gt_bboxes_ignore')
        if self.with_label:
            results['gt_labels'] = ann['labels'].astype(np.int64).copy()
        if self.with_mask:
            from ...core.masks import poly2mask, rle_to_mask
            h, w = results['img_shape'][:2]
            masks = []
            for m in ann['masks']:
                if isinstance(m, list):
                    masks.append(poly2mask(m, h, w))
                elif isinstance(m, dict):
                    masks.append(rle_to_mask(m))
                else:
                    masks.append(np.asarray(m, bool))
            results['gt_masks'] = (np.stack(masks).astype(np.uint8)
                                   if masks else
                                   np.zeros((0, h, w), np.uint8))
            results['mask_fields'] = ['gt_masks']
        if self.with_seg:
            seg_prefix = results.get('seg_prefix') or ''
            seg = _imread(osp.join(seg_prefix, ann['seg_map']))[..., 0]
            results['gt_semantic_seg'] = seg
            results['seg_fields'] = ['gt_semantic_seg']
        return results


@PIPELINES.register_module()
class Resize:
    """(reference: transforms.py:26). keep_ratio rescale, multiscale modes
    'value' (uniform choice) and 'range' (uniform edge sample)."""

    def __init__(self, img_scale=None, multiscale_mode: str = 'range',
                 ratio_range=None, keep_ratio: bool = True,
                 override: bool = False, bbox_clip_border: bool = True,
                 interpolation: str = 'bilinear'):
        if img_scale is None:
            self.img_scale = None
        elif isinstance(img_scale, list):
            self.img_scale = [tuple(s) for s in img_scale]
        else:
            self.img_scale = [tuple(img_scale)]
        self.multiscale_mode = multiscale_mode
        self.ratio_range = ratio_range
        self.keep_ratio = keep_ratio
        self.override = override
        self.bbox_clip_border = bbox_clip_border
        self.interpolation = interpolation

    def _random_scale(self, results):
        rng = results.setdefault('_rng', np.random)
        if self.ratio_range is not None:
            base = self.img_scale[0]
            lo, hi = self.ratio_range
            r = rng.uniform(lo, hi)
            scale = (int(base[0] * r), int(base[1] * r))
        elif len(self.img_scale) == 1:
            scale = self.img_scale[0]
        elif self.multiscale_mode == 'value':
            scale = self.img_scale[rng.randint(len(self.img_scale))]
        else:  # 'range'
            longs = [max(s) for s in self.img_scale]
            shorts = [min(s) for s in self.img_scale]
            long_e = rng.randint(min(longs), max(longs) + 1)
            short_e = rng.randint(min(shorts), max(shorts) + 1)
            scale = (long_e, short_e)
        results['scale'] = scale

    def __call__(self, results):
        if 'scale' not in results or self.override:
            if self.override and 'scale_factor' in results:
                results.pop('scale_factor', None)
            self._random_scale(results)
        img = results['img']
        h, w = img.shape[:2]
        if self.keep_ratio:
            new_w, new_h = rescale_size((w, h), results['scale'])
        else:
            new_w, new_h = results['scale'][1], results['scale'][0]
        img = _imresize(img, (new_w, new_h), self.interpolation)
        w_scale = new_w / w
        h_scale = new_h / h
        results['img'] = img
        results['img_shape'] = img.shape
        results['pad_shape'] = img.shape
        results['scale_factor'] = np.array(
            [w_scale, h_scale, w_scale, h_scale], np.float32)
        results['keep_ratio'] = self.keep_ratio

        for key in results.get('bbox_fields', []):
            bboxes = results[key] * results['scale_factor']
            if self.bbox_clip_border:
                bboxes[:, 0::2] = np.clip(bboxes[:, 0::2], 0, new_w)
                bboxes[:, 1::2] = np.clip(bboxes[:, 1::2], 0, new_h)
            results[key] = bboxes
        for key in results.get('mask_fields', []):
            m = results[key]
            if m.shape[0]:
                results[key] = np.stack([
                    _imresize(mm, (new_w, new_h), 'nearest')
                    for mm in m])
            else:
                results[key] = np.zeros((0, new_h, new_w), m.dtype)
        for key in results.get('seg_fields', []):
            results[key] = _imresize(results[key], (new_w, new_h),
                                     'nearest')
        return results


@PIPELINES.register_module()
class RandomFlip:
    """(reference: transforms.py:319)."""

    def __init__(self, flip_ratio: Optional[float] = None,
                 direction: str = 'horizontal'):
        self.flip_ratio = flip_ratio
        self.direction = direction

    def __call__(self, results):
        rng = results.setdefault('_rng', np.random)
        if 'flip' not in results:
            results['flip'] = (self.flip_ratio is not None
                               and rng.rand() < self.flip_ratio)
            results['flip_direction'] = self.direction
        if not results['flip']:
            return results
        h, w = results['img_shape'][:2]
        d = results['flip_direction']
        for key in results.get('img_fields', ['img']):
            results[key] = _flip_img(results[key], d)
        for key in results.get('bbox_fields', []):
            b = results[key].copy()
            if d in ('horizontal', 'diagonal'):
                b[:, 0::4], b[:, 2::4] = (w - results[key][:, 2::4],
                                          w - results[key][:, 0::4])
            if d in ('vertical', 'diagonal'):
                b[:, 1::4], b[:, 3::4] = (h - results[key][:, 3::4],
                                          h - results[key][:, 1::4])
            results[key] = b
        for key in results.get('mask_fields', []):
            results[key] = np.stack([_flip_img(m, d) for m in results[key]]) \
                if results[key].shape[0] else results[key]
        for key in results.get('seg_fields', []):
            results[key] = _flip_img(results[key], d)
        return results


def _flip_img(img, direction):
    if direction == 'horizontal':
        return np.ascontiguousarray(img[:, ::-1])
    if direction == 'vertical':
        return np.ascontiguousarray(img[::-1])
    return np.ascontiguousarray(img[::-1, ::-1])


@PIPELINES.register_module()
class Normalize:
    """(reference: transforms.py:547). to_rgb flips cv2's BGR."""

    def __init__(self, mean, std, to_rgb: bool = True):
        self.mean = np.array(mean, np.float32)
        self.std = np.array(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results):
        for key in results.get('img_fields', ['img']):
            img = results[key].astype(np.float32)
            if self.to_rgb:
                img = img[..., ::-1]
            results[key] = (img - self.mean) / self.std
        results['img_norm_cfg'] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results


@PIPELINES.register_module()
class Pad:
    """(reference: transforms.py:476). Pads image (and masks/seg) to
    ``size`` or to a multiple of ``size_divisor``."""

    def __init__(self, size=None, size_divisor: Optional[int] = None,
                 pad_val: float = 0):
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val

    def __call__(self, results):
        h, w = results['img'].shape[:2]
        if self.size is not None:
            th, tw = self.size
        else:
            d = self.size_divisor
            th, tw = (h + d - 1) // d * d, (w + d - 1) // d * d
        for key in results.get('img_fields', ['img']):
            img = results[key]
            results[key] = np.pad(
                img, ((0, th - h), (0, tw - w)) + ((0, 0),) * (img.ndim - 2),
                constant_values=self.pad_val)
        for key in results.get('mask_fields', []):
            m = results[key]
            results[key] = np.pad(m, ((0, 0), (0, th - h), (0, tw - w)))
        for key in results.get('seg_fields', []):
            results[key] = np.pad(results[key],
                                  ((0, th - h), (0, tw - w)),
                                  constant_values=255)
        results['pad_shape'] = results['img'].shape
        results['pad_fixed_size'] = self.size
        results['pad_size_divisor'] = self.size_divisor
        return results


@PIPELINES.register_module()
class RandomCrop:
    """(reference: transforms.py:588). Supports 'absolute',
    'absolute_range' (used by Swin mstrain), 'relative',
    'relative_range'."""

    def __init__(self, crop_size, crop_type: str = 'absolute',
                 allow_negative_crop: bool = False,
                 bbox_clip_border: bool = True):
        self.crop_size = tuple(crop_size)
        self.crop_type = crop_type
        self.allow_negative_crop = allow_negative_crop
        self.bbox_clip_border = bbox_clip_border

    def _get_crop_size(self, img_shape, rng):
        h, w = img_shape[:2]
        ch, cw = self.crop_size
        if self.crop_type == 'absolute':
            return min(ch, h), min(cw, w)
        if self.crop_type == 'absolute_range':
            return (rng.randint(min(ch, h), min(cw, h) + 1),
                    rng.randint(min(ch, w), min(cw, w) + 1))
        if self.crop_type == 'relative':
            return int(h * ch + 0.5), int(w * cw + 0.5)
        # relative_range
        rh = rng.uniform(ch, 1.0)
        rw = rng.uniform(cw, 1.0)
        return int(h * rh + 0.5), int(w * rw + 0.5)

    def __call__(self, results):
        rng = results.setdefault('_rng', np.random)
        ch, cw = self._get_crop_size(results['img'].shape, rng)
        img = results['img']
        h, w = img.shape[:2]
        off_h = rng.randint(0, max(h - ch, 0) + 1)
        off_w = rng.randint(0, max(w - cw, 0) + 1)
        for key in results.get('img_fields', ['img']):
            results[key] = results[key][off_h:off_h + ch,
                                        off_w:off_w + cw]
        results['img_shape'] = results['img'].shape

        shift = np.array([off_w, off_h, off_w, off_h], np.float32)
        for key in results.get('bbox_fields', []):
            bboxes = results[key] - shift
            if self.bbox_clip_border:
                bboxes[:, 0::2] = np.clip(bboxes[:, 0::2], 0, cw)
                bboxes[:, 1::2] = np.clip(bboxes[:, 1::2], 0, ch)
            results[key] = bboxes
        # drop invalid gts
        if 'gt_bboxes' in results:
            b = results['gt_bboxes']
            valid = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
            if not valid.any() and not self.allow_negative_crop:
                return None
            results['gt_bboxes'] = b[valid]
            if 'gt_labels' in results:
                results['gt_labels'] = results['gt_labels'][valid]
            if 'gt_masks' in results:
                m = results['gt_masks'][valid]
                results['gt_masks'] = m[:, off_h:off_h + ch,
                                        off_w:off_w + cw]
        for key in results.get('seg_fields', []):
            results[key] = results[key][off_h:off_h + ch, off_w:off_w + cw]
        return results


@PIPELINES.register_module()
class AutoAugment:
    """Policy chooser (reference: auto_augment.py:46). The Swin configs use
    it purely to pick between two resize branches."""

    def __init__(self, policies: Sequence[Sequence[dict]]):
        self.policies = [Compose([dict(p) for p in policy])
                         for policy in policies]

    def __call__(self, results):
        rng = results.setdefault('_rng', np.random)
        policy = self.policies[rng.randint(len(self.policies))]
        return policy(results)


@PIPELINES.register_module()
class PhotoMetricDistortion:
    """(reference: transforms.py:810). Brightness/contrast/saturation/hue
    jitter in the SSD style."""

    def __init__(self, brightness_delta: int = 32,
                 contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta: int = 18):
        self.brightness_delta = brightness_delta
        self.contrast_lower, self.contrast_upper = contrast_range
        self.saturation_lower, self.saturation_upper = saturation_range
        self.hue_delta = hue_delta

    def __call__(self, results):
        import cv2
        rng = results.setdefault('_rng', np.random)
        img = results['img'].astype(np.float32)
        if rng.randint(2):
            img += rng.uniform(-self.brightness_delta,
                               self.brightness_delta)
        mode = rng.randint(2)
        if mode == 1 and rng.randint(2):
            img *= rng.uniform(self.contrast_lower, self.contrast_upper)
        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                           cv2.COLOR_BGR2HSV).astype(np.float32)
        if rng.randint(2):
            hsv[..., 1] *= rng.uniform(self.saturation_lower,
                                       self.saturation_upper)
        if rng.randint(2):
            hsv[..., 0] = (hsv[..., 0] +
                           rng.uniform(-self.hue_delta,
                                       self.hue_delta)) % 180
        hsv[..., 1] = np.clip(hsv[..., 1], 0, 255)
        img = cv2.cvtColor(hsv.astype(np.uint8),
                           cv2.COLOR_HSV2BGR).astype(np.float32)
        if mode == 0 and rng.randint(2):
            img *= rng.uniform(self.contrast_lower, self.contrast_upper)
        results['img'] = img
        return results


@PIPELINES.register_module()
class MultiScaleFlipAug:
    """TTA fan-out (reference: test_time_aug.py:10): scales × flips →
    list of results dicts."""

    def __init__(self, transforms: Sequence[dict], img_scale=None,
                 scale_factor=None, flip: bool = False,
                 flip_direction='horizontal'):
        self.transforms = Compose([dict(t) for t in transforms])
        scales = img_scale if img_scale is not None else scale_factor
        if not isinstance(scales, list):
            scales = [scales]
        self.img_scale = [tuple(s) if isinstance(s, (list, tuple)) else s
                          for s in scales]
        self.flip = flip
        self.flip_direction = (flip_direction if isinstance(
            flip_direction, list) else [flip_direction])

    def __call__(self, results):
        aug_data = []
        flips = [(False, None)]
        if self.flip:
            flips += [(True, d) for d in self.flip_direction]
        for scale in self.img_scale:
            for f, d in flips:
                _r = dict(results)
                _r['scale'] = scale
                _r['flip'] = f
                _r['flip_direction'] = d or 'horizontal'
                out = self.transforms(_r)
                if out is not None:
                    aug_data.append(out)
        # list-of-dict → dict-of-list
        out = {}
        for k in aug_data[0]:
            out[k] = [d[k] for d in aug_data]
        return out


@PIPELINES.register_module()
class ImageToTensor:
    """Kept for config compatibility — arrays stay numpy HWC; batching to
    device tensors happens in datasets/builder (the reference's
    DataContainer/collate machinery is unnecessary with static padded
    batches, SURVEY.md §2.9)."""

    def __init__(self, keys):
        self.keys = keys

    def __call__(self, results):
        return results


@PIPELINES.register_module()
class DefaultFormatBundle:
    """No-op shim (see ImageToTensor)."""

    def __call__(self, results):
        return results


@PIPELINES.register_module()
class Collect:
    """(reference: formating.py:251): select keys + build img_metas."""
    META_KEYS = ('filename', 'ori_filename', 'ori_shape', 'img_shape',
                 'pad_shape', 'scale_factor', 'flip', 'flip_direction',
                 'img_norm_cfg')

    def __init__(self, keys, meta_keys=META_KEYS):
        self.keys = keys
        self.meta_keys = meta_keys

    def __call__(self, results):
        out = {k: results[k] for k in self.keys if k in results}
        out['img_metas'] = {k: results[k] for k in self.meta_keys
                            if k in results}
        return out


@PIPELINES.register_module()
class FilterAnnotations:
    """(reference: loading.py:433) — drop tiny boxes."""

    def __init__(self, min_gt_bbox_wh=(1., 1.), keep_empty: bool = True):
        self.min_w, self.min_h = min_gt_bbox_wh
        self.keep_empty = keep_empty

    def __call__(self, results):
        b = results.get('gt_bboxes')
        if b is None or b.shape[0] == 0:
            return results
        keep = ((b[:, 2] - b[:, 0]) >= self.min_w) & \
               ((b[:, 3] - b[:, 1]) >= self.min_h)
        if not keep.any() and not self.keep_empty:
            return None
        results['gt_bboxes'] = b[keep]
        if 'gt_labels' in results:
            results['gt_labels'] = results['gt_labels'][keep]
        if 'gt_masks' in results:
            results['gt_masks'] = results['gt_masks'][keep]
        return results
