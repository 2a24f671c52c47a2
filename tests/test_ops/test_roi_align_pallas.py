"""Pallas strip-DMA RoIAlign vs the XLA gather spec (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swindet_tpu.ops.roi_align import multilevel_roi_align
from swindet_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas

SHAPES = [(100, 168), (50, 84), (25, 42), (13, 21)]
STRIDES = (4, 8, 16, 32)


@pytest.fixture(scope='module')
def feats(rng_mod=np.random.RandomState(0)):
    return [jnp.asarray(rng_mod.randn(2, h, w, 32).astype(np.float32))
            for h, w in SHAPES]


def _rois(rng, n, img_w=672, img_h=400):
    sizes = rng.uniform(16, 400, n)
    cx = rng.uniform(0, img_w, n)
    cy = rng.uniform(0, img_h, n)
    b = rng.randint(0, 2, n)
    rois = np.stack([b, cx - sizes / 2, cy - sizes / 2,
                     cx + sizes / 2, cy + sizes / 2], -1)
    rois[:, 1:] = np.clip(rois[:, 1:], 0, None)
    return jnp.asarray(rois.astype(np.float32))


def test_matches_xla_spec(feats, rng):
    rois = _rois(rng, 24)
    ref = multilevel_roi_align(feats, rois, STRIDES, 7)
    out = multilevel_roi_align_pallas(feats, rois, STRIDES, 7,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_border_and_invalid_rois(feats, rng):
    rois = jnp.asarray(np.array([
        [0, 0, 0, 30, 30],          # top-left corner
        [0, 640, 370, 700, 420],    # beyond bottom-right border
        [1, 620, 10, 671, 200],     # tall right-edge roi (aspect ~4)
        [0, 0, 0, 0, 0],            # degenerate (padding roi)
    ], np.float32))
    valid = jnp.asarray([True, True, True, False])
    ref = multilevel_roi_align(feats, rois, STRIDES, 7, roi_valid=valid)
    out = multilevel_roi_align_pallas(feats, rois, STRIDES, 7,
                                      roi_valid=valid, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    assert np.abs(np.asarray(out[3])).max() == 0.0


def test_mask_head_size14(feats, rng):
    rois = _rois(rng, 8)
    ref = multilevel_roi_align(feats, rois, STRIDES, 14)
    out = multilevel_roi_align_pallas(feats, rois, STRIDES, 14,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_grad_matches(feats, rng):
    rois = _rois(rng, 6)

    def f_pal(fs):
        return jnp.sum(multilevel_roi_align_pallas(
            fs, rois, STRIDES, 7, interpret=True) ** 2)

    def f_ref(fs):
        return jnp.sum(multilevel_roi_align(fs, rois, STRIDES, 7) ** 2)

    g1 = jax.grad(f_pal)(tuple(feats))
    g2 = jax.grad(f_ref)(tuple(feats))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_extreme_aspect_roi_bounded(feats):
    """Aspect >> 5 rois exceed the strip: output is the documented
    edge-extended approximation — finite and in-range, not exact."""
    rois = jnp.asarray(np.array([[1, 660, 10, 671, 399]], np.float32))
    out = multilevel_roi_align_pallas(feats, rois, STRIDES, 7,
                                      interpret=True)
    ref = multilevel_roi_align(feats, rois, STRIDES, 7)
    assert np.all(np.isfinite(np.asarray(out)))
    # same magnitude scale as the exact result
    assert np.abs(np.asarray(out)).max() < 10 * np.abs(
        np.asarray(ref)).max() + 1.0


def test_bwd_pallas_mixed_rois(feats, rng):
    """Pallas RMW backward vs XLA vjp: strips + invalid + oversize tail.

    Oversize (full-width sliver) rois route through the cond-gated exact
    tail in fwd AND bwd; roi grads are intentionally zero (mmcv
    roi_align backward grads the input only)."""
    rois = jnp.concatenate([
        _rois(rng, 20),
        jnp.asarray(np.array([
            [0, 0, 100, 671, 112],      # full-width sliver -> oversize
            [1, 10, 10, 200, 300],
            [0, 0, 0, 0, 0],            # padding roi
        ], np.float32))], 0)
    valid = jnp.asarray([True] * 21 + [True, False])
    g_seed = np.random.RandomState(3).randn(23, 14, 14, 32)
    g = jnp.asarray(g_seed.astype(np.float32))

    def f_pal(fs):
        return jnp.vdot(multilevel_roi_align_pallas(
            fs, rois, STRIDES, 14, roi_valid=valid, interpret=True), g)

    def f_ref(fs):
        return jnp.vdot(multilevel_roi_align(
            fs, rois, STRIDES, 14, roi_valid=valid), g)

    g1 = jax.grad(f_pal)(tuple(feats))
    g2 = jax.grad(f_ref)(tuple(feats))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
