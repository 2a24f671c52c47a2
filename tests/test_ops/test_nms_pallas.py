"""Pallas single-kernel NMS (ops/nms_pallas.py) vs the XLA exact NMS
(core/nms.py): identical keep set, order, and det values in interpret
mode (the TPU path is the same kernel compiled by Mosaic)."""
import numpy as np
import jax.numpy as jnp
import pytest

from swindet_tpu.core.nms import nms
from swindet_tpu.ops.nms_pallas import nms_pallas_sorted


@pytest.mark.parametrize('seed,n,iou_thr', [(0, 256, 0.5), (3, 1024, 0.5),
                                            (7, 512, 0.7), (11, 128, 0.3)])
def test_pallas_nms_exact(seed, n, iou_thr):
    rs = np.random.RandomState(seed)
    max_out = 100
    xy = rs.rand(n, 2).astype(np.float32) * 300
    wh = rs.rand(n, 2).astype(np.float32) * 80 + 4
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = rs.rand(n).astype(np.float32)
    valid = rs.rand(n) > 0.1

    ref = nms(jnp.asarray(boxes), jnp.asarray(scores), iou_thr, max_out,
              jnp.asarray(valid))

    score = np.where(valid, scores, -np.inf)
    order = np.argsort(-score)
    dets, inds, cnt = nms_pallas_sorted(
        jnp.asarray(boxes[order]), jnp.asarray(score[order]),
        jnp.asarray(valid[order]), jnp.asarray(order), iou_thr, max_out,
        interpret=True)
    k = int(cnt)
    kr = int(np.asarray(ref.valid).sum())
    assert k == kr
    np.testing.assert_array_equal(np.asarray(inds)[:k],
                                  np.asarray(ref.inds)[:kr])
    np.testing.assert_allclose(np.asarray(dets)[:k],
                               np.asarray(ref.dets)[:kr],
                               rtol=1e-5, atol=1e-5)


def test_pallas_nms_dense_overlaps(seed=5):
    """Heavy suppression chains (many near-duplicates) — stresses the
    within-tile sequential pass."""
    rs = np.random.RandomState(seed)
    base = np.array([[10, 10, 60, 60]], np.float32)
    boxes = np.repeat(base, 256, 0) + rs.randn(256, 4).astype(np.float32) * 3
    scores = rs.rand(256).astype(np.float32)
    valid = np.ones(256, bool)
    ref = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 64,
              jnp.asarray(valid))
    score = np.where(valid, scores, -np.inf)
    order = np.argsort(-score)
    dets, inds, cnt = nms_pallas_sorted(
        jnp.asarray(boxes[order]), jnp.asarray(score[order]),
        jnp.asarray(valid[order]), jnp.asarray(order), 0.5, 64,
        interpret=True)
    k = int(cnt)
    assert k == int(np.asarray(ref.valid).sum())
    np.testing.assert_array_equal(np.asarray(inds)[:k],
                                  np.asarray(ref.inds)[:k])
