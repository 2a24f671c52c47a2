"""BBox-coder parity vs the reference torch coders: TBLR
(tblr_bbox_coder.py), YOLO (yolo_bbox_coder.py), and the delta coder's
wh_ratio_clip/clip-border corners (delta_xywh_bbox_coder.py). The
bucketing and legacy coders have their own parity/pinned tests."""
import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')


def _boxes(rs, n, span=80):
    xy = rs.rand(n, 2).astype(np.float32) * span
    wh = rs.rand(n, 2).astype(np.float32) * 40 + 4
    return np.concatenate([xy, xy + wh], -1)


def test_tblr_coder_parity():
    import torch
    refbridge.install()
    from mmdet.core.bbox.coder.tblr_bbox_coder import TBLRBBoxCoder as Ref
    from swindet_tpu.core.bbox.coders import TBLRBBoxCoder

    rs = np.random.RandomState(0)
    priors = _boxes(rs, 25)
    gts = _boxes(rs, 25)
    ref = Ref(normalizer=4.0)
    ours = TBLRBBoxCoder(normalizer=4.0)
    r_enc = ref.encode(torch.tensor(priors), torch.tensor(gts))
    o_enc = ours.encode(jnp.asarray(priors), jnp.asarray(gts))
    np.testing.assert_allclose(np.asarray(o_enc), r_enc.numpy(),
                               rtol=1e-5, atol=1e-5)
    deltas = rs.randn(25, 4).astype(np.float32)
    r_dec = ref.decode(torch.tensor(priors), torch.tensor(deltas),
                       max_shape=(100, 120))
    o_dec = ours.decode(jnp.asarray(priors), jnp.asarray(deltas),
                        max_shape=(100, 120))
    np.testing.assert_allclose(np.asarray(o_dec), r_dec.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_yolo_coder_parity():
    import torch
    refbridge.install()
    from mmdet.core.bbox.coder.yolo_bbox_coder import YOLOBBoxCoder as Ref
    from swindet_tpu.core.bbox.coders import YOLOBBoxCoder

    rs = np.random.RandomState(1)
    anchors = _boxes(rs, 20)
    gts = _boxes(rs, 20)
    stride = 16
    ref = Ref()
    ours = YOLOBBoxCoder()
    r_enc = ref.encode(torch.tensor(anchors), torch.tensor(gts), stride)
    o_enc = ours.encode(jnp.asarray(anchors), jnp.asarray(gts), stride)
    np.testing.assert_allclose(np.asarray(o_enc), r_enc.numpy(),
                               rtol=1e-4, atol=1e-5)
    preds = np.concatenate([
        rs.rand(20, 2).astype(np.float32),          # sigmoided cx,cy
        rs.randn(20, 2).astype(np.float32) * 0.5], -1)
    r_dec = ref.decode(torch.tensor(anchors), torch.tensor(preds), stride)
    o_dec = ours.decode(jnp.asarray(anchors), jnp.asarray(preds), stride)
    np.testing.assert_allclose(np.asarray(o_dec), r_dec.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_delta_coder_extreme_parity():
    """wh_ratio_clip engages + decode clamps at borders."""
    import torch
    refbridge.install()
    from mmdet.core.bbox.coder.delta_xywh_bbox_coder import \
        DeltaXYWHBBoxCoder as Ref
    from swindet_tpu.core.bbox.coders import DeltaXYWHBBoxCoder

    rs = np.random.RandomState(2)
    rois = _boxes(rs, 15)
    deltas = rs.randn(15, 4).astype(np.float32) * 5  # extreme dw/dh
    kw = dict(target_means=[0., 0., 0., 0.],
              target_stds=[0.1, 0.1, 0.2, 0.2])
    ref = Ref(**kw)
    ours = DeltaXYWHBBoxCoder(**kw)
    r = ref.decode(torch.tensor(rois), torch.tensor(deltas),
                   max_shape=(90, 110), wh_ratio_clip=16 / 1000)
    o = ours.decode(jnp.asarray(rois), jnp.asarray(deltas),
                    max_shape=(90, 110), wh_ratio_clip=16 / 1000)
    np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=1e-4,
                               atol=1e-3)
