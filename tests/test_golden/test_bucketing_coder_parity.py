"""BucketingBBoxCoder encode/decode parity vs the reference torch
implementation (core/bbox/coder/bucketing_bbox_coder.py)."""
import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')


def test_bucketing_coder_parity():
    import torch
    refbridge.install()
    from mmdet.core.bbox.coder.bucketing_bbox_coder import \
        BucketingBBoxCoder as RefCoder
    from swindet_tpu.core.bbox.coders import BucketingBBoxCoder

    rs = np.random.RandomState(0)
    prop = rs.rand(6, 4).astype(np.float32) * 100
    prop[:, 2:] += prop[:, :2] + 20
    gt = prop + rs.randn(6, 4).astype(np.float32) * 5

    ref = RefCoder(num_buckets=14, scale_factor=3.0)
    ours = BucketingBBoxCoder(num_buckets=14, scale_factor=3.0)
    r = ref.encode(torch.tensor(prop), torch.tensor(gt))
    o = ours.encode(jnp.asarray(prop), jnp.asarray(gt))
    for i, name in enumerate(['offsets', 'offset_weights',
                              'bucket_labels', 'cls_weights']):
        np.testing.assert_allclose(np.asarray(o[i]), r[i].numpy(),
                                   rtol=1e-4, atol=1e-4, err_msg=name)

    cls_p = rs.randn(6, 28).astype(np.float32)
    off_p = rs.randn(6, 28).astype(np.float32) * 0.3
    rb, rc = ref.decode(torch.tensor(prop),
                        [torch.tensor(cls_p), torch.tensor(off_p)],
                        max_shape=(120, 120))
    ob, oc = ours.decode(jnp.asarray(prop),
                         (jnp.asarray(cls_p), jnp.asarray(off_p)),
                         max_shape=(120, 120))
    np.testing.assert_allclose(np.asarray(ob), rb.numpy(), rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(oc), rc.numpy(), rtol=1e-4,
                               atol=1e-4)
