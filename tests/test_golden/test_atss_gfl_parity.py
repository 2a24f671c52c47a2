"""Golden parity for the ATSS/GFL machinery vs the reference's own code
(reference: mmdet/core/bbox/assigners/atss_assigner.py,
mmdet/models/losses/gfocal_loss.py)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from . import refbridge

pytestmark = pytest.mark.skipif(not refbridge.reference_available(),
                                reason='reference checkout not mounted')


def _random_scene(seed, num_gt=5, levels=((32, 32), (16, 16), (8, 8))):
    """Anchor grid over synthetic levels + random gt boxes."""
    rs = np.random.RandomState(seed)
    anchors, num_level = [], []
    for lvl, (h, w) in enumerate(levels):
        stride = 8 * 2 ** lvl
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
        cx = (xs.ravel() + 0.5) * stride
        cy = (ys.ravel() + 0.5) * stride
        s = 8 * stride / 2
        anchors.append(np.stack([cx - s, cy - s, cx + s, cy + s], -1))
        num_level.append(h * w)
    anchors = np.concatenate(anchors, 0).astype(np.float32)
    ctr = rs.rand(num_gt, 2) * 200 + 10
    wh = rs.rand(num_gt, 2) * 120 + 16
    gts = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1)
    gts = gts.clip(0, 255).astype(np.float32)
    labels = rs.randint(0, 4, (num_gt,))
    return anchors, num_level, gts, labels


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('num_gt', [1, 5, 11])
def test_atss_assigner_parity(seed, num_gt):
    refbridge.install()
    from mmdet.core.bbox.assigners import ATSSAssigner as RefATSS
    from swindet_tpu.core.bbox.assigners import ATSSAssigner

    anchors, num_level, gts, labels = _random_scene(seed, num_gt)
    ref = RefATSS(topk=9)
    r = ref.assign(torch.from_numpy(anchors), num_level,
                   torch.from_numpy(gts), None,
                   torch.from_numpy(labels.astype(np.int64)))

    g_pad = 16  # padded gt slots
    gts_p = np.zeros((g_pad, 4), np.float32)
    gts_p[:num_gt] = gts
    labels_p = np.zeros((g_pad,), np.int32)
    labels_p[:num_gt] = labels
    valid = np.zeros((g_pad,), bool)
    valid[:num_gt] = True

    mine = ATSSAssigner(topk=9)
    m = mine.assign(jnp.asarray(anchors), num_level, jnp.asarray(gts_p),
                    jnp.asarray(valid), jnp.asarray(labels_p))

    np.testing.assert_array_equal(np.asarray(m.gt_inds),
                                  r.gt_inds.numpy())
    np.testing.assert_array_equal(np.asarray(m.labels),
                                  r.labels.numpy())
    pos = r.gt_inds.numpy() > 0
    np.testing.assert_allclose(np.asarray(m.max_overlaps)[pos],
                               r.max_overlaps.numpy()[pos], atol=1e-5)


def test_quality_focal_loss_parity():
    refbridge.install()
    from mmdet.models.losses import QualityFocalLoss as RefQFL
    from swindet_tpu.models.losses.losses import QualityFocalLoss

    rs = np.random.RandomState(0)
    n, c = 64, 6
    pred = rs.randn(n, c).astype(np.float32)
    labels = rs.randint(0, c + 1, (n,))          # c == background
    score = np.where(labels < c, rs.rand(n), 0.0).astype(np.float32)
    weight = rs.rand(n).astype(np.float32)

    ref = RefQFL(use_sigmoid=True, beta=2.0, loss_weight=1.0)
    r = ref(torch.from_numpy(pred),
            (torch.from_numpy(labels.astype(np.int64)),
             torch.from_numpy(score)),
            weight=torch.from_numpy(weight), avg_factor=17.0)

    mine = QualityFocalLoss(beta=2.0)
    m = mine(jnp.asarray(pred),
             (jnp.asarray(labels.astype(np.int32)), jnp.asarray(score)),
             weight=jnp.asarray(weight), avg_factor=17.0)
    np.testing.assert_allclose(float(m), float(r), rtol=1e-5)


def test_distribution_focal_loss_parity():
    refbridge.install()
    from mmdet.models.losses import DistributionFocalLoss as RefDFL
    from swindet_tpu.models.losses.losses import DistributionFocalLoss

    rs = np.random.RandomState(1)
    n, bins = 80, 17
    pred = rs.randn(n, bins).astype(np.float32)
    label = (rs.rand(n) * (bins - 1 - 0.1)).astype(np.float32)
    weight = rs.rand(n).astype(np.float32)

    ref = RefDFL(loss_weight=0.25)
    r = ref(torch.from_numpy(pred), torch.from_numpy(label),
            weight=torch.from_numpy(weight), avg_factor=33.0)
    mine = DistributionFocalLoss(loss_weight=0.25)
    m = mine(jnp.asarray(pred), jnp.asarray(label),
             weight=jnp.asarray(weight), avg_factor=33.0)
    np.testing.assert_allclose(float(m), float(r), rtol=1e-5)


@pytest.mark.parametrize('seed', [0, 1])
def test_grid_assigner_parity(seed):
    """GridAssigner + responsible_flags + YOLOBBoxCoder vs reference."""
    refbridge.install()
    import torch
    from mmdet.core.bbox.assigners import GridAssigner as RefGrid
    from mmdet.core.anchor import build_anchor_generator as ref_ag_build
    from mmdet.core.bbox.coder import YOLOBBoxCoder as RefCoder
    from swindet_tpu.core.bbox.assigners import GridAssigner
    from swindet_tpu.core.anchors import YOLOAnchorGenerator
    from swindet_tpu.core.bbox.coders import YOLOBBoxCoder

    base_sizes = [[(116, 90), (156, 198), (373, 326)],
                  [(30, 61), (62, 45), (59, 119)],
                  [(10, 13), (16, 30), (33, 23)]]
    featmap_sizes = [(4, 4), (8, 8), (16, 16)]
    ref_gen = ref_ag_build(dict(type='YOLOAnchorGenerator',
                                strides=[32, 16, 8],
                                base_sizes=base_sizes))
    my_gen = YOLOAnchorGenerator(strides=[32, 16, 8],
                                 base_sizes=base_sizes)

    rs = np.random.RandomState(seed)
    n_gt = 4
    ctr = rs.rand(n_gt, 2) * 100 + 10
    wh = rs.rand(n_gt, 2) * 60 + 10
    gts = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1)
    gts = gts.clip(0, 127).astype(np.float32)
    labels = rs.randint(0, 4, (n_gt,)).astype(np.int64)

    ref_anchors = ref_gen.grid_anchors(featmap_sizes, device='cpu')
    ref_resp = ref_gen.responsible_flags(featmap_sizes,
                                         torch.from_numpy(gts),
                                         device='cpu')
    r = RefGrid(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0).assign(
        torch.cat(ref_anchors), torch.cat(ref_resp),
        torch.from_numpy(gts), torch.from_numpy(labels))

    my_anchors = jnp.concatenate(my_gen.grid_anchors(featmap_sizes), 0)
    g_pad = 8
    gts_p = np.zeros((g_pad, 4), np.float32)
    gts_p[:n_gt] = gts
    labels_p = np.zeros((g_pad,), np.int32)
    labels_p[:n_gt] = labels
    valid = np.zeros((g_pad,), bool)
    valid[:n_gt] = True
    my_resp = jnp.concatenate(my_gen.responsible_flags(
        featmap_sizes, jnp.asarray(gts_p), jnp.asarray(valid)), 0)
    np.testing.assert_array_equal(np.asarray(my_resp),
                                  torch.cat(ref_resp).numpy().astype(bool))
    m = GridAssigner(pos_iou_thr=0.5, neg_iou_thr=0.5,
                     min_pos_iou=0).assign(
        my_anchors, my_resp, jnp.asarray(gts_p), jnp.asarray(valid),
        jnp.asarray(labels_p))
    np.testing.assert_array_equal(np.asarray(m.gt_inds),
                                  r.gt_inds.numpy())
    np.testing.assert_array_equal(np.asarray(m.labels), r.labels.numpy())

    # coder roundtrip parity on the positive anchors
    rc, mc = RefCoder(), YOLOBBoxCoder()
    pos = r.gt_inds.numpy() > 0
    if pos.any():
        pa = torch.cat(ref_anchors)[pos]
        pg = torch.from_numpy(gts)[r.gt_inds.numpy()[pos] - 1]
        enc_r = rc.encode(pa, pg, torch.full((int(pos.sum()),), 16.0))
        enc_m = mc.encode(jnp.asarray(pa.numpy()), jnp.asarray(pg.numpy()),
                          16.0)
        np.testing.assert_allclose(np.asarray(enc_m), enc_r.numpy(),
                                   atol=1e-5)
        dec_r = rc.decode(pa, enc_r, torch.full((int(pos.sum()),), 16.0))
        dec_m = mc.decode(jnp.asarray(pa.numpy()), jnp.asarray(enc_m), 16.0)
        np.testing.assert_allclose(np.asarray(dec_m), dec_r.numpy(),
                                   atol=1e-4)
