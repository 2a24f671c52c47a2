"""RLE codec tests — round-trip + known-value checks of the native
pycocotools-compatible implementation (swindet_tpu/core/rle.py)."""
import numpy as np

from swindet_tpu.core import rle as maskUtils


def test_encode_decode_roundtrip(rng):
    for _ in range(10):
        m = (rng.rand(23, 31) > 0.5).astype(np.uint8)
        r = maskUtils.encode(m)
        np.testing.assert_array_equal(maskUtils.decode(r), m)


def test_empty_and_full():
    z = np.zeros((7, 5), np.uint8)
    o = np.ones((7, 5), np.uint8)
    np.testing.assert_array_equal(maskUtils.decode(maskUtils.encode(z)), z)
    np.testing.assert_array_equal(maskUtils.decode(maskUtils.encode(o)), o)


def test_known_string_format():
    """counts→string→counts round-trip incl. the delta coding of
    counts[i>2] and negative-delta varints."""
    for counts in ([0, 35], [5, 3, 7, 3, 2], [10, 1, 10, 1, 10, 1],
                   [0, 1, 100000, 1, 2]):
        c = np.asarray(counts, np.int64)
        s = maskUtils.counts_to_string(c)
        np.testing.assert_array_equal(maskUtils.string_to_counts(s), c)


def test_area_and_bbox():
    m = np.zeros((20, 30), np.uint8)
    m[5:15, 10:20] = 1
    r = maskUtils.encode(m)
    assert maskUtils.area(r) == 100
    np.testing.assert_array_equal(maskUtils.to_bbox(r), [10, 5, 10, 10])


def test_column_major_order():
    """COCO RLE is Fortran-order: a single set pixel at (row=2, col=0) in
    a 4x3 mask must give counts [2, 1, 9]."""
    m = np.zeros((4, 3), np.uint8)
    m[2, 0] = 1
    r = maskUtils.encode(m)
    np.testing.assert_array_equal(
        maskUtils.string_to_counts(r['counts']), [2, 1, 9])


def test_mask_iou():
    a = np.zeros((10, 10), np.uint8)
    a[0:4, 0:4] = 1       # area 16
    b = np.zeros((10, 10), np.uint8)
    b[2:6, 2:6] = 1       # area 16, inter 4, union 28
    ra, rb = maskUtils.encode(a), maskUtils.encode(b)
    iou = maskUtils.iou([ra], [rb], [0])
    np.testing.assert_allclose(iou, [[4 / 28]])
    # crowd: inter / det area
    iof = maskUtils.iou([ra], [rb], [1])
    np.testing.assert_allclose(iof, [[4 / 16]])


def test_merge():
    a = np.zeros((5, 5), np.uint8)
    a[:2] = 1
    b = np.zeros((5, 5), np.uint8)
    b[3:] = 1
    merged = maskUtils.decode(maskUtils.merge(
        [maskUtils.encode(a), maskUtils.encode(b)]))
    np.testing.assert_array_equal(merged, a | b)


def test_frpyobjects_polygon():
    # a 4x4 square polygon at (1,1)-(5,5)
    poly = [[1, 1, 5, 1, 5, 5, 1, 5]]
    r = maskUtils.frPyObjects(poly, 10, 10)[0]
    m = maskUtils.decode(r)
    assert m[3, 3] == 1
    assert m[0, 0] == 0
    assert m[7, 7] == 0
