"""Native (C++) mask runtime — build-on-first-use, ctypes-loaded.

The TPU framework's counterpart of pycocotools' C extension: the segm
eval host path (RLE codec / pairwise mask IoU / paste-to-canvas) runs
in optimized C++ (rle_ops.cpp) when a toolchain is present, with
bit-identical numpy fallbacks in core/masks.py when it is not.

The shared object is compiled once into ~/.cache/swindet_tpu/native
(keyed by source hash) with plain ``g++ -O3 -shared -fPIC`` — no
pybind11/pip needed; the ABI is C with numpy buffers.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import os.path as osp
import subprocess

import numpy as np

_SRC = osp.join(osp.dirname(__file__), 'rle_ops.cpp')
_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get('SWINDET_NO_NATIVE'):
        return None
    try:
        with open(_SRC, 'rb') as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        cache = osp.join(osp.expanduser('~'), '.cache', 'swindet_tpu',
                         'native')
        os.makedirs(cache, exist_ok=True)
        so = osp.join(cache, f'rle_ops_{tag}.so')
        if not osp.exists(so):
            tmp = so + f'.tmp{os.getpid()}'
            subprocess.run(
                ['g++', '-O3', '-march=native', '-std=c++17', '-shared',
                 '-fPIC', _SRC, '-o', tmp],
                check=True, capture_output=True)
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        i64 = ctypes.c_int64
        lib.rle_decode.argtypes = [u32p, i64, u8p, i64]
        lib.rle_encode.argtypes = [u8p, i64, u32p]
        lib.rle_encode.restype = i64
        lib.rle_iou.argtypes = [u32p, i64p, i64, u32p, i64p, i64,
                                u8p, f64p]
        lib.paste_masks.argtypes = [f32p, i64, i64, f32p, i64, i64,
                                    ctypes.c_float, u8p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def _as(arr, dtype):
    return np.ascontiguousarray(arr, dtype=dtype)


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def rle_decode(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    """Uncompressed counts → (h, w) bool mask (column-major runs)."""
    lib = _build_and_load()
    counts = _as(counts, np.uint32)
    out = np.empty(h * w, np.uint8)
    lib.rle_decode(_ptr(counts, ctypes.c_uint32), len(counts),
                   _ptr(out, ctypes.c_uint8), h * w)
    return out.reshape(w, h).T.astype(bool)


def rle_encode(mask: np.ndarray) -> np.ndarray:
    """(h, w) mask → uncompressed counts (column-major runs)."""
    lib = _build_and_load()
    flat = _as(mask.T.reshape(-1), np.uint8)
    out = np.empty(flat.size + 1, np.uint32)
    n = lib.rle_encode(_ptr(flat, ctypes.c_uint8), flat.size,
                       _ptr(out, ctypes.c_uint32))
    return out[:n].copy()


def rle_iou(dt_counts_list, gt_counts_list, iscrowd) -> np.ndarray:
    """Pairwise IoU from uncompressed counts lists (crowd gt: union =
    area(dt), pycocotools semantics)."""
    lib = _build_and_load()
    n_dt, n_gt = len(dt_counts_list), len(gt_counts_list)
    if n_dt == 0 or n_gt == 0:
        return np.zeros((n_dt, n_gt))
    dt = _as(np.concatenate([_as(c, np.uint32)
                             for c in dt_counts_list]), np.uint32)
    gt = _as(np.concatenate([_as(c, np.uint32)
                             for c in gt_counts_list]), np.uint32)
    dt_off = np.zeros(n_dt + 1, np.int64)
    np.cumsum([len(c) for c in dt_counts_list], out=dt_off[1:])
    gt_off = np.zeros(n_gt + 1, np.int64)
    np.cumsum([len(c) for c in gt_counts_list], out=gt_off[1:])
    crowd = _as(np.asarray(iscrowd), np.uint8)
    out = np.empty((n_dt, n_gt), np.float64)
    lib.rle_iou(_ptr(dt, ctypes.c_uint32), _ptr(dt_off, ctypes.c_int64),
                n_dt, _ptr(gt, ctypes.c_uint32),
                _ptr(gt_off, ctypes.c_int64), n_gt,
                _ptr(crowd, ctypes.c_uint8),
                _ptr(out, ctypes.c_double))
    return out


def paste_masks(mask_probs: np.ndarray, boxes: np.ndarray, img_h: int,
                img_w: int, threshold: float = 0.5) -> np.ndarray:
    """(n, s, s) probs + (n, 4) boxes → (n, img_h, img_w) bool."""
    lib = _build_and_load()
    n, s, _ = mask_probs.shape
    probs = _as(mask_probs, np.float32)
    bx = _as(boxes[:, :4], np.float32)
    out = np.empty((n, img_h, img_w), np.uint8)
    lib.paste_masks(_ptr(probs, ctypes.c_float), n, s,
                    _ptr(bx, ctypes.c_float), img_h, img_w,
                    float(threshold), _ptr(out, ctypes.c_uint8))
    return out.view(bool)   # same itemsize — no 100MB-scale copy


# --------------------------------------------------------------- image ops
# Native data-loading pipeline (image_ops.cpp): JPEG/PNG decode,
# keep-ratio bilinear resize, fused normalize+pad batch loader with a
# GIL-free std::thread pool — the TPU framework's counterpart of the
# reference's torch-DataLoader fork workers (mmdet datasets/builder.py).
_IMG_SRC = osp.join(osp.dirname(__file__), 'image_ops.cpp')
_IMG_LIB = None
_IMG_TRIED = False


def _build_and_load_image():
    global _IMG_LIB, _IMG_TRIED
    if _IMG_TRIED:
        return _IMG_LIB
    _IMG_TRIED = True
    if os.environ.get('SWINDET_NO_NATIVE'):
        return None
    try:
        with open(_IMG_SRC, 'rb') as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        cache = osp.join(osp.expanduser('~'), '.cache', 'swindet_tpu',
                         'native')
        os.makedirs(cache, exist_ok=True)
        so = osp.join(cache, f'image_ops_{tag}.so')
        if not osp.exists(so):
            tmp = so + f'.tmp{os.getpid()}'
            subprocess.run(
                ['g++', '-O3', '-march=native', '-std=c++17', '-shared',
                 '-fPIC', _IMG_SRC, '-o', tmp, '-ljpeg', '-lpng'],
                check=True, capture_output=True)
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i64 = ctypes.c_int64
        lib.image_decode.argtypes = [ctypes.c_char_p, u8p, i64, i64p,
                                     i64p]
        lib.image_decode.restype = ctypes.c_int
        lib.image_resize_bilinear.argtypes = [u8p, i64, i64, u8p, i64,
                                              i64]
        lib.image_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), i64, f32p, i64, i64, i64,
            i64, f32p, f32p, ctypes.c_int, i64p, f32p, ctypes.c_int]
        lib.image_load_batch.restype = ctypes.c_int
        lib.image_load_batch_train.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), i64, f32p, i64, i64, i64p,
            i64p, u8p, f32p, f32p, ctypes.c_int, i64p, f32p,
            ctypes.c_int]
        lib.image_load_batch_train.restype = ctypes.c_int
        _IMG_LIB = lib
    except Exception:
        _IMG_LIB = None
    return _IMG_LIB


def image_available() -> bool:
    return _build_and_load_image() is not None


def image_decode(path: str, max_hw: int = 8192) -> np.ndarray:
    """Decode a JPEG/PNG file to a BGR uint8 (H, W, 3) array (cv2
    layout). Raises on failure — callers fall back to cv2."""
    lib = _build_and_load_image()
    buf = np.empty(max_hw * max_hw * 3 // 4, np.uint8)
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    rc = lib.image_decode(path.encode(), _ptr(buf, ctypes.c_uint8),
                          buf.size, ctypes.byref(h),
                          ctypes.byref(w))
    if rc:
        raise IOError(f'native decode failed ({rc}): {path}')
    return buf[:h.value * w.value * 3].reshape(
        h.value, w.value, 3).copy()


def image_resize(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Bilinear u8 resize, half-pixel centers (cv2 INTER_LINEAR
    geometry, float weights — within ±1 LSB of cv2)."""
    lib = _build_and_load_image()
    src = _as(img, np.uint8)
    h, w = src.shape[:2]
    out = np.empty((oh, ow, 3), np.uint8)
    lib.image_resize_bilinear(_ptr(src, ctypes.c_uint8), h, w,
                              _ptr(out, ctypes.c_uint8), oh, ow)
    return out


def image_load_batch(paths, canvas_hw, scale_long_short, mean, std,
                     to_rgb: bool = True, threads: int = 4):
    """Decode+rescale+normalize+pad a batch with the native thread
    pool. Returns (imgs (N, ch, cw, 3) float32, shapes (N, 2) int64
    resized hw, scales (N, 2) float32 (w_scale, h_scale)). Failed
    samples keep a zero canvas and shape (0, 0)."""
    lib = _build_and_load_image()
    n = len(paths)
    ch, cw = canvas_hw
    le, se = scale_long_short
    # oversubscription is catastrophic on small hosts (the pool's
    # work-stealing spins); never exceed the core count
    threads = max(1, min(threads, os.cpu_count() or 1, n))
    out = np.empty((n, ch, cw, 3), np.float32)
    shapes = np.empty((n, 2), np.int64)
    scales = np.empty((n, 2), np.float32)
    mean = _as(np.asarray(mean, np.float32), np.float32)
    std = _as(np.asarray(std, np.float32), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.image_load_batch(arr, n, _ptr(out, ctypes.c_float), ch, cw,
                         int(le), int(se), _ptr(mean, ctypes.c_float),
                         _ptr(std, ctypes.c_float), int(to_rgb),
                         _ptr(shapes, ctypes.c_int64),
                         _ptr(scales, ctypes.c_float), int(threads))
    return out, shapes, scales


def image_load_batch_train(paths, canvas_hw, long_edges, short_edges,
                           flips, mean, std, to_rgb: bool = True,
                           threads: int = 4, out=None):
    """Train-pipeline batch: per-sample keep-ratio rescale to
    (long_edges[i], short_edges[i]) + optional horizontal flip (mmdet
    order Resize -> RandomFlip) + normalize + pad, with the native
    GIL-free thread pool. The host samples each image's mstrain /
    AutoAugment scale branch and flip coin; this does the pixel work.
    Returns (imgs (N, ch, cw, 3) float32, shapes (N, 2) int64,
    scales (N, 2) float32 (w_scale, h_scale))."""
    lib = _build_and_load_image()
    n = len(paths)
    ch, cw = canvas_hw
    threads = max(1, min(threads, os.cpu_count() or 1, n))
    if out is None:
        out = np.empty((n, ch, cw, 3), np.float32)
    else:
        # write-in-place fast path (the AutoAugment loader hands the
        # batched branch a contiguous slice of the batch buffer)
        assert out.shape == (n, ch, cw, 3) and out.flags['C_CONTIGUOUS'] \
            and out.dtype == np.float32, (out.shape, out.dtype)
    shapes = np.empty((n, 2), np.int64)
    scales = np.empty((n, 2), np.float32)
    le = _as(np.asarray(long_edges, np.int64), np.int64)
    se = _as(np.asarray(short_edges, np.int64), np.int64)
    fl = _as(np.asarray(flips, np.uint8), np.uint8)
    mean = _as(np.asarray(mean, np.float32), np.float32)
    std = _as(np.asarray(std, np.float32), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.image_load_batch_train(
        arr, n, _ptr(out, ctypes.c_float), ch, cw,
        _ptr(le, ctypes.c_int64), _ptr(se, ctypes.c_int64),
        _ptr(fl, ctypes.c_uint8), _ptr(mean, ctypes.c_float),
        _ptr(std, ctypes.c_float), int(to_rgb),
        _ptr(shapes, ctypes.c_int64), _ptr(scales, ctypes.c_float),
        int(threads))
    if rc:
        # match the Python pipeline, which raises on an unreadable
        # image, instead of silently training on a zero canvas with
        # live GT boxes (advisor r4)
        raise IOError(
            f'native train loader: failed to decode {paths[rc - 1]!r}')
    return out, shapes, scales
