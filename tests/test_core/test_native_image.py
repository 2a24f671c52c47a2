"""Native image pipeline (image_ops.cpp): decode parity with cv2,
bilinear resize geometry, batched keep-ratio load vs the Python
pipeline math (reference counterpart: mmdet DataLoader fork workers +
mmcv imread/imresize/imnormalize)."""
import os

import numpy as np
import pytest

from swindet_tpu import native

pytestmark = pytest.mark.skipif(
    not native.image_available(), reason='native toolchain unavailable')


def _write_test_images(tmp_path):
    import cv2
    rng = np.random.RandomState(7)
    # smooth-ish content so JPEG round-trip differences stay tiny
    base = rng.randint(0, 255, (37, 53, 3)).astype(np.uint8)
    img = cv2.GaussianBlur(base, (7, 7), 3)
    jpg = str(tmp_path / 'a.jpg')
    png = str(tmp_path / 'b.png')
    cv2.imwrite(jpg, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    cv2.imwrite(png, img)
    return jpg, png, img


def test_decode_matches_cv2(tmp_path):
    import cv2
    jpg, png, img = _write_test_images(tmp_path)
    for path in (jpg, png):
        ours = native.image_decode(path)
        ref = cv2.imread(path, cv2.IMREAD_COLOR)
        assert ours.shape == ref.shape
        # PNG is lossless → exact; JPEG decoders may differ by IDCT
        # rounding (libjpeg vs cv2's libjpeg-turbo)
        tol = 0 if path.endswith('png') else 2
        assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= tol


def test_resize_matches_cv2():
    import cv2
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (48, 64, 3)).astype(np.uint8)
    for oh, ow in ((24, 32), (96, 128), (33, 57)):
        ours = native.image_resize(img, oh, ow)
        ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
        assert ours.shape == ref.shape
        # float weights vs cv2's 11-bit fixed point → ±2 LSB
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert np.mean(diff) < 0.5 and np.max(diff) <= 2


def test_load_batch_keep_ratio_pipeline(tmp_path):
    jpg, png, img = _write_test_images(tmp_path)
    mean = [123.675, 116.28, 103.53]
    std = [58.395, 57.12, 57.375]
    out, shapes, scales = native.image_load_batch(
        [jpg, png], canvas_hw=(64, 96), scale_long_short=(80, 48),
        mean=mean, std=std, to_rgb=True, threads=2)
    assert out.shape == (2, 64, 96, 3) and out.dtype == np.float32
    h, w = img.shape[:2]                      # 37 x 53
    s = min(80 / max(h, w), 48 / min(h, w))   # keep_ratio scale
    eh, ew = int(h * s + 0.5), int(w * s + 0.5)
    assert tuple(shapes[0]) == (eh, ew) == tuple(shapes[1])
    np.testing.assert_allclose(scales[0], [ew / w, eh / h], rtol=1e-6)
    # normalize parity on the lossless PNG sample
    ours = out[1]
    resized = native.image_resize(img, eh, ew).astype(np.float32)
    rgb = resized[..., ::-1]
    expect = (rgb - np.asarray(mean, np.float32)) / \
        np.asarray(std, np.float32)
    np.testing.assert_allclose(ours[:eh, :ew], expect, atol=1e-4)
    # padding stays zero
    assert np.all(ours[eh:] == 0) and np.all(ours[:, ew:] == 0)


def test_imread_native_flag(tmp_path, monkeypatch):
    _, png, img = _write_test_images(tmp_path)
    from swindet_tpu.datasets.pipelines.transforms import _imread
    monkeypatch.setenv('SWINDET_NATIVE_IMAGE', '1')
    got = _imread(png)
    np.testing.assert_array_equal(got, img)
