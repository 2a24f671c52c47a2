"""Soft-NMS parity: swindet_tpu.core.nms.soft_nms vs the pure-torch
mmcv-semantics shim (tests/test_golden/_stubs/mmcv/ops/nms.py soft_nms,
itself mirroring mmcv.ops.soft_nms: greedy max-score selection, linear /
gaussian decay of surviving neighbours, <= min_score drop-out).

Reference call path: mmdet/models/dense_heads/corner_head.py
_bboxes_nms -> mmcv.ops.batched_nms(type='soft_nms') and the
*_softnms_* test configs.

Scores are well-separated (spacing >> fp noise) by construction: the
selection cascade is exactly reproducible only when no two candidates
are closer than the cross-impl noise — the same reason the CornerNet
e2e golden test pins hard NMS instead (see test_e2e_parity_extra.py).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from swindet_tpu.core.nms import soft_nms


def _make(n, seed, spread=60.0):
    rng = np.random.RandomState(seed)
    ctr = rng.uniform(10, 90, (n, 2))
    wh = rng.uniform(5, spread, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1)
    boxes = boxes.astype(np.float32)
    # distinct, well-separated scores (spacing ~ 0.9/n)
    scores = np.linspace(0.05, 0.95, n, dtype=np.float32)
    rng.shuffle(scores)
    return boxes, scores


@pytest.mark.parametrize('method', ['linear', 'gaussian'])
@pytest.mark.parametrize('seed', [0, 3])
@pytest.mark.parametrize('min_score', [1e-3, 0.3])
def test_soft_nms_matches_mmcv_semantics(method, seed, min_score):
    import torch
    from tests.test_golden._stubs.mmcv.ops.nms import soft_nms as ref
    boxes, scores = _make(48, seed)
    r_dets, r_keep = ref(torch.from_numpy(boxes),
                         torch.from_numpy(scores),
                         iou_threshold=0.4, sigma=0.5,
                         min_score=min_score, method=method)
    res = soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                   iou_threshold=0.4, sigma=0.5, min_score=min_score,
                   method=method)
    valid = np.asarray(res.valid)
    j_inds = np.asarray(res.inds)[valid]
    j_scores = np.asarray(res.dets)[valid, 4]
    r_keep = r_keep.numpy()
    r_scores = r_dets.numpy()[:, 4]
    assert len(r_keep) > 0  # non-degenerate case
    np.testing.assert_array_equal(j_inds, r_keep)
    np.testing.assert_allclose(j_scores, r_scores, rtol=1e-5, atol=1e-6)


def test_soft_nms_max_out_is_top_prefix():
    """Selection scores are monotone non-increasing, so max_out
    truncation equals the reference's sort-then-truncate."""
    boxes, scores = _make(48, seed=1)
    full = soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                    iou_threshold=0.4, method='gaussian')
    cut = soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                   iou_threshold=0.4, method='gaussian', max_out=10)
    np.testing.assert_array_equal(np.asarray(cut.inds),
                                  np.asarray(full.inds)[:10])
    sel = np.asarray(full.dets)[np.asarray(full.valid), 4]
    assert np.all(np.diff(sel) <= 1e-7)
