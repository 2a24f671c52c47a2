"""Tests for Expand/MinIoURandomCrop/CutOut + AutoAugment ops
(reference test model: tests/test_data/test_transform.py,
test_translate.py, test_rotate.py, test_shear.py). Enhancement ops are
checked against PIL, the semantics mmcv mirrors."""
import numpy as np
import pytest

from swindet_tpu.datasets.pipelines import (
    BrightnessTransform, ColorTransform, ContrastTransform, CutOut,
    EqualizeTransform, Expand, MinIoURandomCrop, Rotate, Shear, Translate)


def _results(seed=0, h=60, w=80, n=3, with_mask=True):
    rs = np.random.RandomState(seed)
    img = rs.randint(0, 255, (h, w, 3), np.uint8)
    ctr = rs.rand(n, 2) * [w * 0.6, h * 0.6] + [w * 0.2, h * 0.2]
    wh = rs.rand(n, 2) * [w * 0.2, h * 0.2] + 8
    bboxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1)
    bboxes[:, 0::2] = bboxes[:, 0::2].clip(0, w - 1)
    bboxes[:, 1::2] = bboxes[:, 1::2].clip(0, h - 1)
    r = dict(img=img, img_shape=img.shape, ori_shape=img.shape,
             img_fields=['img'], bbox_fields=['gt_bboxes'],
             gt_bboxes=bboxes.astype(np.float32),
             gt_labels=np.arange(n, dtype=np.int64),
             _rng=np.random.RandomState(seed + 100))
    if with_mask:
        masks = np.zeros((n, h, w), np.uint8)
        for i, b in enumerate(bboxes.astype(int)):
            masks[i, b[1]:b[3], b[0]:b[2]] = 1
        r['gt_masks'] = masks
        r['mask_fields'] = ['gt_masks']
    return r


def test_expand():
    r = _results()
    orig = r['gt_bboxes'].copy()
    orig_img = r['img'].copy()
    out = Expand(mean=(10, 20, 30), to_rgb=False, ratio_range=(2, 2),
                 prob=1.0)(r)
    eh, ew = out['img'].shape[:2]
    assert (eh, ew) == (120, 160)
    shift = out['gt_bboxes'] - orig
    # uniform shift, same for every box
    assert np.allclose(shift[:, 0], shift[0, 0])
    assert np.allclose(shift[:, 1], shift[0, 1])
    left, top = int(shift[0, 0]), int(shift[0, 1])
    np.testing.assert_array_equal(
        out['img'][top:top + 60, left:left + 80], orig_img)
    # canvas filled with mean
    assert tuple(out['img'][0, 0]) == (10, 20, 30)
    # masks shifted identically
    ys, xs = np.nonzero(out['gt_masks'][0])
    b = out['gt_bboxes'][0]
    assert abs(ys.min() - b[1]) <= 1 and abs(xs.min() - b[0]) <= 1


def test_expand_prob_zero_identity():
    r = _results()
    img = r['img'].copy()
    out = Expand(prob=0.0)(r)
    np.testing.assert_array_equal(out['img'], img)


def test_min_iou_random_crop():
    r = _results()
    out = MinIoURandomCrop(min_ious=(0.4,), min_crop_size=0.5)(r)
    h, w = out['img'].shape[:2]
    assert h <= 60 and w <= 80
    b = out['gt_bboxes']
    assert len(b) == len(out['gt_labels']) == len(out['gt_masks'])
    if len(b):
        assert (b[:, 0] >= 0).all() and (b[:, 2] <= w).all()
        assert (b[:, 1] >= 0).all() and (b[:, 3] <= h).all()
        assert out['gt_masks'].shape[1:] == (h, w)


def test_cutout():
    r = _results()
    out = CutOut(n_holes=2, cutout_shape=(10, 10),
                 fill_in=(7, 7, 7))(r)
    assert (out['img'] == 7).any()
    out2 = CutOut(n_holes=1, cutout_ratio=(0.2, 0.2))(_results(1))
    assert out2['img'].shape == (60, 80, 3)


@pytest.mark.parametrize('op_cls,kwargs', [
    (Shear, dict(level=5, direction='horizontal')),
    (Shear, dict(level=5, direction='vertical')),
    (Rotate, dict(level=5)),
    (Translate, dict(level=3, direction='horizontal')),
    (Translate, dict(level=3, direction='vertical')),
])
def test_geometric_mask_bbox_consistency(op_cls, kwargs):
    """After warping, each gt box must still cover its warped mask."""
    r = _results()
    out = op_cls(prob=1.0, random_negative_prob=0.0, **kwargs)(r)
    assert out['img'].shape == (60, 80, 3)
    for i in range(len(out['gt_bboxes'])):
        m = out['gt_masks'][i]
        if m.sum() == 0:
            continue
        ys, xs = np.nonzero(m)
        b = out['gt_bboxes'][i]
        assert xs.min() >= b[0] - 2 and xs.max() <= b[2] + 2
        assert ys.min() >= b[1] - 2 and ys.max() <= b[3] + 2


def test_geometric_zero_level_identity():
    for op in [Shear(level=0, prob=1.0, random_negative_prob=0.0),
               Rotate(level=0, prob=1.0, random_negative_prob=0.0),
               Translate(level=0, prob=1.0, random_negative_prob=0.0)]:
        r = _results()
        img = r['img'].copy()
        bboxes = r['gt_bboxes'].copy()
        out = op(r)
        np.testing.assert_array_equal(out['img'], img)
        np.testing.assert_allclose(out['gt_bboxes'], bboxes, atol=1e-4)


def test_translate_offset():
    r = _results()
    bboxes = r['gt_bboxes'].copy()
    op = Translate(level=2, prob=1.0, random_negative_prob=0.0,
                   max_translate_offset=100.)
    out = op(r)   # offset = 2/10*100 = 20 px right
    np.testing.assert_allclose(out['gt_bboxes'][:, 0],
                               np.clip(bboxes[:, 0] + 20, 0, 80),
                               atol=1e-4)


def test_brightness_matches_pil():
    from PIL import Image, ImageEnhance
    r = _results()
    img = r['img'].copy()
    out = BrightnessTransform(level=5, prob=1.0)(r)
    factor = 5 / 10 * 1.8 + 0.1
    ref = np.asarray(ImageEnhance.Brightness(
        Image.fromarray(img)).enhance(factor))
    assert np.abs(out['img'].astype(int) - ref.astype(int)).max() <= 1


def test_contrast_matches_pil():
    from PIL import Image, ImageEnhance
    r = _results()
    img = r['img'].copy()
    out = ContrastTransform(level=5, prob=1.0)(r)
    factor = 5 / 10 * 1.8 + 0.1
    # PIL contrast works on RGB; our images are BGR — compare channelwise
    # via the same grayscale base by flipping to RGB
    ref = np.asarray(ImageEnhance.Contrast(
        Image.fromarray(img[..., ::-1])).enhance(factor))[..., ::-1]
    assert np.abs(out['img'].astype(int) - ref.astype(int)).max() <= 2


def test_equalize_matches_pil():
    from PIL import Image, ImageOps
    r = _results()
    img = r['img'].copy()
    out = EqualizeTransform(prob=1.0)(r)
    ref = np.asarray(ImageOps.equalize(Image.fromarray(img)))
    assert np.abs(out['img'].astype(int) - ref.astype(int)).max() <= 1


def test_color_transform_runs():
    r = _results()
    out = ColorTransform(level=3, prob=1.0)(r)
    assert out['img'].shape == (60, 80, 3)
    # level 10 → factor ~1.9 exaggerates color; level ~5 in [0,255]
    assert out['img'].dtype == np.uint8
