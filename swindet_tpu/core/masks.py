"""Mask structures & host-boundary utilities.

Replaces the reference's BitmapMasks/PolygonMasks + pycocotools glue
(reference: mmdet/core/mask/structures.py:188,524, utils.py:36).
pycocotools is not available in this environment, so RLE encode/decode
(COCO uncompressed + LEB128-style compressed string format) and polygon
rasterisation are implemented natively here.

Device-side mask work (target cropping) lives in ops/roi_align;
`paste_masks` is the single host-side step between jit output and RLE.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple, Union

import numpy as np


# --------------------------------------------------------------------- RLE
def mask_to_rle(mask: np.ndarray) -> Dict:
    """Binary (H, W) mask → COCO compressed RLE dict (column-major counts,
    LEB128-ish ascii encoding identical to pycocotools)."""
    h, w = mask.shape
    flat = np.asfortranarray(mask).reshape(-1, order='F').astype(np.uint8)
    # run lengths, starting with a (possibly zero) run of 0s
    diff = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    runs = np.diff(np.concatenate([[0], diff, [len(flat)]]))
    if flat[0] == 1:
        runs = np.concatenate([[0], runs])
    return {'size': [int(h), int(w)], 'counts': _rle_encode_counts(runs)}


def _rle_encode_counts(counts: np.ndarray) -> bytes:
    """pycocotools rleToString: delta-encoded LEB128 variant, 6-bit groups
    offset by 48."""
    out = bytearray()
    cnts = [int(c) for c in counts]
    for i, x in enumerate(cnts):
        if i > 2:
            x -= cnts[i - 2]
        more = True
        while more:
            c = x & 0x1f
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


def rle_to_mask(rle: Dict) -> np.ndarray:
    """COCO RLE dict (compressed bytes/str or uncompressed list) →
    binary (H, W) mask."""
    h, w = rle['size']
    counts = rle['counts']
    if isinstance(counts, (bytes, str)):
        counts = _rle_decode_counts(
            counts if isinstance(counts, bytes) else counts.encode())
    counts = np.asarray(counts, np.int64)
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    flat = np.pad(flat, (0, h * w - len(flat)))
    return flat.reshape(w, h).T.astype(bool)


def _rle_decode_counts(s: bytes) -> List[int]:
    cnts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1f) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * (k + 1))
            k += 1
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return cnts


def rle_area(rle: Dict) -> float:
    counts = rle['counts']
    if isinstance(counts, (bytes, str)):
        counts = _rle_decode_counts(
            counts if isinstance(counts, bytes) else counts.encode())
    return float(sum(counts[1::2]))


def _uncompressed_counts(rle: Dict) -> np.ndarray:
    counts = rle['counts']
    if isinstance(counts, (bytes, str)):
        counts = _rle_decode_counts(
            counts if isinstance(counts, bytes) else counts.encode())
    return np.asarray(counts, np.uint32)


def rle_iou(dt: Sequence[Dict], gt: Sequence[Dict],
            iscrowd: Sequence[bool]) -> np.ndarray:
    """Pairwise mask IoU (pycocotools maskUtils.iou semantics incl.
    crowd: union = area(dt) for crowd gt). RLE-native in C++ when the
    native runtime is built (swindet_tpu/native — run-list sweep, no
    bitmap decode); numpy bitmap fallback otherwise."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    from .. import native
    if native.available():
        return native.rle_iou([_uncompressed_counts(d) for d in dt],
                              [_uncompressed_counts(g) for g in gt],
                              [bool(c) for c in iscrowd])
    dmasks = [rle_to_mask(d) for d in dt]
    gmasks = [rle_to_mask(g) for g in gt]
    out = np.zeros((len(dt), len(gt)))
    for i, dm in enumerate(dmasks):
        da = dm.sum()
        for j, gm in enumerate(gmasks):
            inter = np.logical_and(dm, gm).sum()
            if iscrowd[j]:
                union = da
            else:
                union = da + gm.sum() - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


# ----------------------------------------------------------------- polygons
def poly2mask(polygons: Sequence[Sequence[float]], h: int,
              w: int) -> np.ndarray:
    """COCO polygon(s) → binary mask (reference: pipelines/loading.py:263
    via pycocotools.frPyObjects). Uses cv2.fillPoly."""
    import cv2
    mask = np.zeros((h, w), np.uint8)
    pts = [np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
           for p in polygons if len(p) >= 6]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask.astype(bool)


# ------------------------------------------------------------------- paste
def paste_masks(mask_probs: np.ndarray, boxes: np.ndarray,
                img_h: int, img_w: int,
                threshold: float = 0.5) -> np.ndarray:
    """Paste (N, s, s) mask probs into an (img_h, img_w) canvas at `boxes`
    (x1,y1,x2,y2) — the host-boundary equivalent of the reference's
    `_do_paste_mask` (fcn_mask_head.py:306, grid_sample semantics with
    align_corners=False).

    Returns (N, img_h, img_w) bool.
    """
    from .. import native
    if native.available() and len(mask_probs):
        return native.paste_masks(np.asarray(mask_probs, np.float32),
                                  np.asarray(boxes, np.float32),
                                  img_h, img_w, threshold)
    n, s, _ = mask_probs.shape
    out = np.zeros((n, img_h, img_w), bool)
    for i in range(n):
        x1, y1, x2, y2 = boxes[i]
        w = x2 - x1
        h = y2 - y1
        if w <= 0 or h <= 0:
            continue
        # integer paste window, 1px slack each side (reference:
        # fcn_mask_head.py:336-342 skip_empty box)
        ix1 = max(int(np.floor(x1)) - 1, 0)
        iy1 = max(int(np.floor(y1)) - 1, 0)
        ix2 = min(int(np.ceil(x2)) + 1, img_w)
        iy2 = min(int(np.ceil(y2)) + 1, img_h)
        if ix2 <= ix1 or iy2 <= iy1:
            continue
        # sample the s×s mask at each target pixel centre
        ys = (np.arange(iy1, iy2) + 0.5 - y1) / h * s - 0.5
        xs = (np.arange(ix1, ix2) + 0.5 - x1) / w * s - 0.5
        out[i, iy1:iy2, ix1:ix2] = _bilinear_2d(
            mask_probs[i], ys, xs) >= threshold
    return out


def _bilinear_2d(img: np.ndarray, ys: np.ndarray,
                 xs: np.ndarray) -> np.ndarray:
    """Sample img at the outer product of ys, xs — grid_sample
    align_corners=False semantics with ZERO padding (out-of-range taps
    contribute 0), matching the reference's F.grid_sample default."""
    h, w = img.shape
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    wy = ys - y0
    wx = xs - x0

    def tap(yy, xx):
        yv = (yy >= 0) & (yy < h)
        xv = (xx >= 0) & (xx < w)
        v = img[np.ix_(np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1))]
        return v * np.outer(yv, xv)

    return (tap(y0, x0) * np.outer(1 - wy, 1 - wx) +
            tap(y0, x0 + 1) * np.outer(1 - wy, wx) +
            tap(y0 + 1, x0) * np.outer(wy, 1 - wx) +
            tap(y0 + 1, x0 + 1) * np.outer(wy, wx))


def encode_mask_results(mask_results: List[List[np.ndarray]]) -> List[List]:
    """Per-class full-res bool masks → RLE (reference:
    core/mask/utils.py:36 encode_mask_results)."""
    return [[mask_to_rle(m) for m in cls_masks]
            for cls_masks in mask_results]
