"""Loss parity vs reference torch implementations for the round-3 loss
wave: VarifocalLoss (varifocal_loss.py), BoundedIoULoss (iou_loss.py
bounded_iou_loss), GaussianFocalLoss (gaussian_focal_loss.py),
KnowledgeDistillationKLDivLoss (kd_loss.py), AssociativeEmbedding
(ae_loss.py). Complements the GHM/BalancedL1/QFL/DFL parity suite."""
import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')


def test_varifocal_parity():
    import torch
    refbridge.install()
    from mmdet.models.losses.varifocal_loss import VarifocalLoss as Ref
    from swindet_tpu.models.losses.losses import VarifocalLoss

    rs = np.random.RandomState(0)
    pred = rs.randn(40, 6).astype(np.float32)
    target = np.zeros((40, 6), np.float32)
    pos = rs.rand(40, 6) < 0.1
    target[pos] = rs.rand(pos.sum()).astype(np.float32)
    weight = rs.rand(40).astype(np.float32)

    for iou_weighted in (True, False):
        ref = Ref(alpha=0.75, gamma=2.0, iou_weighted=iou_weighted)
        ours = VarifocalLoss(alpha=0.75, gamma=2.0,
                             iou_weighted=iou_weighted)
        r = ref(torch.tensor(pred), torch.tensor(target),
                weight=torch.tensor(weight)[:, None].repeat(1, 6),
                avg_factor=37.0)
        o = ours(jnp.asarray(pred), jnp.asarray(target),
                 weight=jnp.asarray(weight), avg_factor=37.0)
        assert float(o) == pytest.approx(float(r), rel=1e-5)


def test_bounded_iou_parity():
    import torch
    refbridge.install()
    from mmdet.models.losses.iou_loss import BoundedIoULoss as Ref
    from swindet_tpu.models.losses.losses import BoundedIoULoss

    rs = np.random.RandomState(1)
    xy = rs.rand(30, 2).astype(np.float32) * 50
    wh = rs.rand(30, 2).astype(np.float32) * 40 + 4
    pred = np.concatenate([xy, xy + wh], -1)
    target = pred + rs.randn(30, 4).astype(np.float32) * 3
    target[:, 2:] = np.maximum(target[:, 2:], target[:, :2] + 1)
    w = rs.rand(30, 4).astype(np.float32)

    ref = Ref(beta=0.2, eps=1e-3)
    ours = BoundedIoULoss(beta=0.2, eps=1e-3)
    r = ref(torch.tensor(pred), torch.tensor(target),
            weight=torch.tensor(w), avg_factor=25.0)
    o = ours(jnp.asarray(pred), jnp.asarray(target), weight=jnp.asarray(w),
             avg_factor=25.0)
    assert float(o) == pytest.approx(float(r), rel=1e-5)


def test_gaussian_focal_parity():
    import torch
    refbridge.install()
    from mmdet.models.losses.gaussian_focal_loss import \
        GaussianFocalLoss as Ref
    from swindet_tpu.models.losses.losses import GaussianFocalLoss

    rs = np.random.RandomState(2)
    pred = rs.rand(2, 8, 8, 3).astype(np.float32) * 0.98 + 0.01
    target = (rs.rand(2, 8, 8, 3) ** 3).astype(np.float32)
    target[0, 2, 3, 1] = 1.0
    ref = Ref(alpha=2.0, gamma=4.0)
    ours = GaussianFocalLoss(alpha=2.0, gamma=4.0)
    r = ref(torch.tensor(pred), torch.tensor(target), avg_factor=7.0)
    o = ours(jnp.asarray(pred), jnp.asarray(target), avg_factor=7.0)
    assert float(o) == pytest.approx(float(r), rel=1e-5)


def test_kd_kl_parity():
    import torch
    refbridge.install()
    from mmdet.models.losses.kd_loss import \
        KnowledgeDistillationKLDivLoss as Ref
    from swindet_tpu.models.losses.losses import \
        KnowledgeDistillationKLDivLoss

    rs = np.random.RandomState(3)
    pred = rs.randn(20, 17).astype(np.float32) * 2
    soft = rs.randn(20, 17).astype(np.float32) * 2
    w = rs.rand(20).astype(np.float32)
    ref = Ref(T=10)
    ours = KnowledgeDistillationKLDivLoss(T=10)
    r = ref(torch.tensor(pred), torch.tensor(soft),
            weight=torch.tensor(w), avg_factor=11.0)
    o = ours(jnp.asarray(pred), jnp.asarray(soft), weight=jnp.asarray(w),
             avg_factor=11.0)
    assert float(o) == pytest.approx(float(r), rel=1e-4)


def test_ae_loss_parity():
    """Our masked AE loss vs the reference's per-image loop
    (ae_loss.py ae_loss_per_image aggregates pull/push per image)."""
    import torch
    refbridge.install()
    from mmdet.models.losses.ae_loss import ae_loss_per_image
    from swindet_tpu.models.losses.losses import AssociativeEmbeddingLoss

    rs = np.random.RandomState(4)
    b, gmax, m = 2, 6, 1
    h = w = 10
    # reference: embedding maps + corner index lists per image
    tl_map = rs.randn(b, m, h, w).astype(np.float32)
    br_map = rs.randn(b, m, h, w).astype(np.float32)
    counts = [4, 2]
    pull_r, push_r = 0.0, 0.0
    tl_g = np.zeros((b, gmax, m), np.float32)
    br_g = np.zeros((b, gmax, m), np.float32)
    valid = np.zeros((b, gmax), bool)
    for i in range(b):
        ys = rs.randint(0, h, counts[i])
        xs = rs.randint(0, w, counts[i])
        ys2 = rs.randint(0, h, counts[i])
        xs2 = rs.randint(0, w, counts[i])
        match = [((y, x), (y2, x2)) for y, x, y2, x2 in
                 zip(ys, xs, ys2, xs2)]
        p_r, q_r = ae_loss_per_image(torch.tensor(tl_map[i]),
                                     torch.tensor(br_map[i]), match)
        pull_r += float(p_r)
        push_r += float(q_r)
        tl_g[i, :counts[i], 0] = tl_map[i, 0, ys, xs]
        br_g[i, :counts[i], 0] = br_map[i, 0, ys2, xs2]
        valid[i, :counts[i]] = True

    ours = AssociativeEmbeddingLoss(pull_weight=1.0, push_weight=1.0)
    pull_o, push_o = ours(jnp.asarray(tl_g), jnp.asarray(br_g),
                          jnp.asarray(valid))
    assert float(pull_o) == pytest.approx(pull_r, rel=1e-4)
    assert float(push_o) == pytest.approx(push_r, rel=1e-4)
