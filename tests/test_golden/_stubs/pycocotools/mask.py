"""pycocotools.mask shim delegating to swindet's native RLE codec.

Used only when golden tests exercise the reference's mask structures;
the underlying codec is independently tested against hand-built RLEs in
tests/test_core/test_masks.py.
"""
import numpy as np

from swindet_tpu.core.masks import (mask_to_rle, rle_to_mask, rle_area,
                                    rle_iou, poly2mask)


def encode(bimask):
    if bimask.ndim == 3:
        return [mask_to_rle(np.asfortranarray(bimask[:, :, i]))
                for i in range(bimask.shape[2])]
    return mask_to_rle(bimask)


def decode(rleObjs):
    if isinstance(rleObjs, (list, tuple)):
        return np.stack([rle_to_mask(r) for r in rleObjs], axis=2)
    return rle_to_mask(rleObjs)


def area(rleObjs):
    if isinstance(rleObjs, (list, tuple)):
        return np.array([rle_area(r) for r in rleObjs])
    return rle_area(rleObjs)


def iou(dt, gt, iscrowd):
    return rle_iou(dt, gt, iscrowd)


def merge(rleObjs, intersect=False):
    masks = [rle_to_mask(r) for r in rleObjs]
    out = masks[0]
    for m in masks[1:]:
        out = (out & m) if intersect else (out | m)
    return mask_to_rle(out)


def frPyObjects(pyobj, h, w):
    if isinstance(pyobj, dict):  # already RLE (uncompressed counts list)
        if isinstance(pyobj.get('counts'), (list, tuple)):
            from swindet_tpu.core.masks import _rle_encode_counts
            return {'size': [h, w],
                    'counts': _rle_encode_counts(
                        np.asarray(pyobj['counts'], dtype=np.int64))}
        return pyobj
    if isinstance(pyobj, (list, tuple)) and len(pyobj) > 0:
        if isinstance(pyobj[0], (list, tuple, np.ndarray)):
            return [mask_to_rle(poly2mask([p], h, w)) for p in pyobj]
        if isinstance(pyobj[0], dict):
            return [frPyObjects(p, h, w) for p in pyobj]
        # single flat polygon
        return mask_to_rle(poly2mask([pyobj], h, w))
    raise ValueError('unsupported pyobj for frPyObjects')


def toBbox(rleObjs):
    single = isinstance(rleObjs, dict)
    objs = [rleObjs] if single else rleObjs
    out = []
    for r in objs:
        m = rle_to_mask(r)
        ys, xs = np.nonzero(m)
        if len(ys) == 0:
            out.append([0, 0, 0, 0])
        else:
            out.append([xs.min(), ys.min(), xs.max() - xs.min() + 1,
                        ys.max() - ys.min() + 1])
    arr = np.asarray(out, dtype=np.float64)
    return arr[0] if single else arr
