"""CornerHead.decode_heatmap parity vs the reference torch decode
(mmdet/models/dense_heads/corner_head.py:864): identical synthetic
heatmaps/offsets/embeddings (and centripetal shifts) → identical raw
boxes/scores/classes. Pins local-max NMS, class-major top-k, corner
pairing and the centripetal central-region rejection."""
import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')

H, W, C = 12, 16, 5
K, NUM_DETS = 8, 24


def _inputs(seed, emb=True):
    rs = np.random.RandomState(seed)
    d = dict(
        tl_heat=rs.rand(1, C, H, W).astype(np.float32),
        br_heat=rs.rand(1, C, H, W).astype(np.float32),
        tl_off=rs.randn(1, 2, H, W).astype(np.float32) * 0.3,
        br_off=rs.randn(1, 2, H, W).astype(np.float32) * 0.3)
    if emb:
        d['tl_emb'] = rs.randn(1, 1, H, W).astype(np.float32)
        d['br_emb'] = rs.randn(1, 1, H, W).astype(np.float32)
    else:
        d['tl_centripetal_shift'] = \
            rs.randn(1, 2, H, W).astype(np.float32) * 0.5
        d['br_centripetal_shift'] = \
            rs.randn(1, 2, H, W).astype(np.float32) * 0.5
    return d


def _ref_head():
    refbridge.install()
    from mmdet.models.dense_heads.corner_head import CornerHead
    return CornerHead.__new__(CornerHead)  # decode needs no params


def _compare(seed, emb):
    import torch
    ref = _ref_head()
    d = _inputs(seed, emb)
    t = {k: torch.tensor(v) for k, v in d.items()}
    img_meta = dict(pad_shape=(H * 4, W * 4, 3),
                    border=(0, 0, 0, 0))
    rb, rscore, rcls = ref.decode_heatmap(
        t['tl_heat'], t['br_heat'], t['tl_off'], t['br_off'],
        tl_emb=t.get('tl_emb'), br_emb=t.get('br_emb'),
        tl_centripetal_shift=t.get('tl_centripetal_shift'),
        br_centripetal_shift=t.get('br_centripetal_shift'),
        img_meta=img_meta, k=K, kernel=3, distance_threshold=0.5,
        num_dets=NUM_DETS)

    from swindet_tpu.models.dense_heads.corner_head import CornerHead
    ours = CornerHead.__new__(CornerHead)
    nhwc = {k: jnp.asarray(v[0].transpose(1, 2, 0)) for k, v in d.items()}
    ob, oscore, ocls = ours.decode_heatmap(
        nhwc['tl_heat'], nhwc['br_heat'], nhwc['tl_off'],
        nhwc['br_off'],
        nhwc.get('tl_emb'), nhwc.get('br_emb'),
        jnp.asarray([H * 4, W * 4], jnp.float32), k=K, kernel=3,
        distance_threshold=0.5, num_dets=NUM_DETS,
        tl_centripetal=nhwc.get('tl_centripetal_shift'),
        br_centripetal=nhwc.get('br_centripetal_shift'))

    rscore = rscore.numpy().reshape(-1)
    rb = rb.numpy().reshape(-1, 4)
    rcls = rcls.numpy().reshape(-1)
    oscore = np.asarray(oscore)
    # reference keeps invalid pairs at score -1 as well; compare the
    # positive-score det sets sorted by score
    ro = np.argsort(-rscore, kind='stable')
    oo = np.argsort(-oscore, kind='stable')
    nr = int((rscore > 0).sum())
    no = int((oscore > 0).sum())
    assert nr == no
    np.testing.assert_allclose(oscore[oo][:nr], rscore[ro][:nr],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ob)[oo][:nr], rb[ro][:nr],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(ocls)[oo][:nr],
                                  rcls[ro][:nr])


@pytest.mark.parametrize('seed', [0, 3])
def test_corner_decode_parity_embedding(seed):
    _compare(seed, emb=True)


@pytest.mark.parametrize('seed', [1])
def test_corner_decode_parity_centripetal(seed):
    _compare(seed, emb=False)
