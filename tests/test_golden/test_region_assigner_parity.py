"""RegionAssigner parity vs the reference algorithm
(core/bbox/assigners/region_assigner.py:36, used by CascadeRPN/GA).

The oracle is built from the reference's OWN primitives (calc_region +
anchor_ctr_inside_region_flags + the documented sequential paint
order), applied correctly. The shipped reference has an indexing bug:
step "4. (cont.)" does ``mlvl_assigned_gt_inds[lvl][ignore_flags] = -1``
where ``ignore_flags`` is a LONG tensor (``torch.zeros_like`` of a long
tensor, :147/:197), so torch scatters by VALUE — adjacent-level ignore
rings are never applied and cells 0/1 of every level are clobbered to
-1 instead. This framework implements the documented semantics; the
test also pins the exact divergence so the deviation is tracked."""
import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')


def _setup(seed):
    from swindet_tpu.core.anchors import AnchorGenerator
    strides = [8, 16, 32]
    sizes = [(16, 20), (8, 10), (4, 5)]
    gen = AnchorGenerator(scales=[4], ratios=[1.0], strides=strides)
    anchors = [np.asarray(a) for a in gen.grid_anchors(sizes)]
    rs = np.random.RandomState(seed)
    g = 5
    xy = rs.rand(g, 2).astype(np.float32) * 70
    wh = rs.rand(g, 2).astype(np.float32) ** 2 * 150 + 6
    gt = np.concatenate([xy, xy + wh], -1)
    return strides, sizes, anchors, gt, g


def _oracle(strides, sizes, anchors, gt, anchor_scale=4,
            center_ratio=0.2, ignore_ratio=0.5):
    """The reference loop with bool masks (the documented semantics)."""
    import torch
    import mmdet.core.bbox.assigners.region_assigner as ra
    g = gt.shape[0]
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    scale = np.sqrt((gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1]))
    tl = np.floor(np.log2(scale) - np.log2(anchor_scale * strides[0])
                  + 0.5).clip(0, len(sizes) - 1).astype(int)
    ml = [np.zeros(len(a), np.int64) for a in anchors]
    ign = [np.zeros(len(a), bool) for a in anchors]
    for gid in range(g):
        lvl = tl[gid]
        gtt = torch.tensor(gt[gid])
        ig = ra.anchor_ctr_inside_region_flags(
            torch.tensor(anchors[lvl]), strides[lvl],
            ra.calc_region(gtt, r2, strides[lvl], sizes[lvl])).numpy()
        ml[lvl][ig] = -1
        ps = ra.anchor_ctr_inside_region_flags(
            torch.tensor(anchors[lvl]), strides[lvl],
            ra.calc_region(gtt, r1, strides[lvl], sizes[lvl])).numpy()
        ml[lvl][ps] = gid + 1
        for d in (lvl - 1, lvl + 1):
            if 0 <= d < len(sizes):
                ig2 = ra.anchor_ctr_inside_region_flags(
                    torch.tensor(anchors[d]), strides[d],
                    ra.calc_region(gtt, r2, strides[d],
                                   sizes[d])).numpy()
                ign[d] |= ig2
    for lvl in range(len(sizes)):
        ml[lvl][ign[lvl]] = -1
    return np.concatenate(ml), tl


@pytest.mark.parametrize('seed', [0, 5])
def test_region_assigner_matches_documented_semantics(seed):
    refbridge.install()
    from swindet_tpu.core.bbox.assigners import RegionAssigner

    strides, sizes, anchors, gt, g = _setup(seed)
    want, _ = _oracle(strides, sizes, anchors, gt)

    ours = RegionAssigner(center_ratio=0.2, ignore_ratio=0.5)
    o = ours.assign([jnp.asarray(a) for a in anchors], sizes, strides, 4,
                    jnp.asarray(gt), jnp.ones(g, bool),
                    jnp.arange(g, dtype=jnp.int32))
    np.testing.assert_array_equal(np.asarray(o.gt_inds), want)
    assert (want > 0).sum() > 0


def test_reference_divergence_is_the_long_index_bug():
    """Pin WHERE the shipped reference differs from the documented
    semantics: exactly the adjacent-level ignore cells (never applied)
    plus the value-scattered cells {0, 1} per level."""
    import torch
    refbridge.install()
    import mmdet.core.bbox.assigners.region_assigner as ra

    strides, sizes, anchors, gt, g = _setup(0)
    want, tl = _oracle(strides, sizes, anchors, gt)
    ref = ra.RegionAssigner(0.2, 0.5)
    r = ref.assign(
        [torch.tensor(a) for a in anchors],
        [torch.ones(len(a), dtype=torch.bool) for a in anchors],
        torch.tensor(gt), dict(img_shape=(128, 160, 3)),
        sizes, 4, strides, gt_labels=None, allowed_border=-1).gt_inds \
        .numpy()
    # recompute the oracle WITHOUT adjacent-level ignores and with the
    # {0,1} clobber — must equal the shipped reference exactly
    ml = []
    offset = 0
    for lvl, a in enumerate(anchors):
        seg = want[offset:offset + len(a)].copy()
        offset += len(a)
        ml.append(seg)
    # undo adjacent ignores: rebuild without them
    r1, r2 = 0.4, 0.25
    ml = [np.zeros(len(a), np.int64) for a in anchors]
    for gid in range(g):
        lvl = tl[gid]
        gtt = torch.tensor(gt[gid])
        ig = ra.anchor_ctr_inside_region_flags(
            torch.tensor(anchors[lvl]), strides[lvl],
            ra.calc_region(gtt, r2, strides[lvl], sizes[lvl])).numpy()
        ml[lvl][ig] = -1
        ps = ra.anchor_ctr_inside_region_flags(
            torch.tensor(anchors[lvl]), strides[lvl],
            ra.calc_region(gtt, r1, strides[lvl], sizes[lvl])).numpy()
        ml[lvl][ps] = gid + 1
    for seg in ml:
        seg[0] = -1     # value-scatter of the long 0/1 "mask"
        seg[1] = -1
    np.testing.assert_array_equal(np.concatenate(ml), r)
