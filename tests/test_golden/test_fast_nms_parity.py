"""YOLACT fast_nms parity vs the reference torch implementation
(core/post_processing/bbox_nms.py:96): identical dets/labels/coeff
rows on the same inputs (ours padded to max_num with a validity
mask)."""
import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')


@pytest.mark.parametrize('seed', [0, 4])
def test_fast_nms_parity(seed):
    import torch
    refbridge.install()
    from mmdet.core.post_processing.bbox_nms import fast_nms as ref_nms
    from swindet_tpu.core.nms import fast_nms

    rs = np.random.RandomState(seed)
    n, c, p = 40, 6, 8
    xy = rs.rand(n, 2).astype(np.float32) * 60
    wh = rs.rand(n, 2).astype(np.float32) * 30 + 4
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = rs.rand(n, c + 1).astype(np.float32)
    coeffs = rs.randn(n, p).astype(np.float32)

    rdets, rlabels, rcoeffs = ref_nms(
        torch.tensor(boxes), torch.tensor(scores), torch.tensor(coeffs),
        score_thr=0.3, iou_thr=0.5, top_k=20, max_num=15)

    out = fast_nms(jnp.asarray(boxes), jnp.asarray(scores),
                   jnp.asarray(coeffs), score_thr=0.3, iou_thr=0.5,
                   top_k=20, max_num=15)
    k = int(np.asarray(out.valid).sum())
    assert k == rdets.shape[0]
    np.testing.assert_allclose(np.asarray(out.dets)[:k], rdets.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.labels)[:k],
                                  rlabels.numpy())
    np.testing.assert_allclose(np.asarray(out.coeffs)[:k],
                               rcoeffs.numpy(), rtol=1e-5, atol=1e-5)
