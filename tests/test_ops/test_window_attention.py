"""Pallas fused window attention vs pure-lax spec (interpret mode on
CPU; the same kernel compiles natively on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swindet_tpu.ops.window_attention import (window_attention,
                                              window_attention_reference)


@pytest.mark.parametrize('mask_on', [False, True])
def test_fused_matches_reference(rng, mask_on):
    b_, n, nh, hd = 12, 49, 3, 32
    c = nh * hd
    qkv = jnp.asarray(rng.randn(b_, n, 3 * c).astype(np.float32))
    bias = jnp.asarray(rng.randn(nh, n, n).astype(np.float32))
    mask = None
    if mask_on:
        nw = 4
        m = np.zeros((nw, n, n), np.float32)
        m[1, :10, 10:] = -100.0
        m[1, 10:, :10] = -100.0
        mask = jnp.asarray(m)
    ref = window_attention_reference(qkv, bias, mask, nh)
    out = window_attention(qkv, bias, mask, num_heads=nh, wblk=8,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_nondivisible_batch(rng):
    """B_ not a multiple of wblk exercises the pad/unpad path."""
    b_, n, nh, hd = 5, 49, 2, 16
    c = nh * hd
    qkv = jnp.asarray(rng.randn(b_, n, 3 * c).astype(np.float32))
    bias = jnp.asarray(rng.randn(nh, n, n).astype(np.float32))
    ref = window_attention_reference(qkv, bias, None, nh)
    out = window_attention(qkv, bias, None, num_heads=nh, wblk=4,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('mask_on', [False, True])
def test_v3_backward_kernel_matches_lax_vjp(rng, mask_on):
    """Pallas backward (dqkv, dbias) == jax.vjp over the lax reference,
    exercised through the production custom_vjp (forward saves the fp32
    softmax P; backward consumes it — no softmax recompute)."""
    from swindet_tpu.ops.window_attention_v3 import window_attention_v3
    b_, n, nh, hd = 12, 49, 3, 32
    c = nh * hd
    qkv = jnp.asarray(rng.randn(b_, n, 3 * c).astype(np.float32))
    bias = jnp.asarray(rng.randn(nh, n, n).astype(np.float32))
    if mask_on:
        nw = 4
        m = np.zeros((nw, n, n), np.float32)
        m[1, :10, 10:] = -100.0
        m[1, 10:, :10] = -100.0
        mask = jnp.asarray(m)
    else:
        mask = None
    g = jnp.asarray(rng.randn(b_, n, c).astype(np.float32))

    mref = mask if mask is not None else jnp.zeros((1, n, n), jnp.float32)
    _, vjp = jax.vjp(
        lambda a, b: window_attention_reference(a, b, mref, nh),
        qkv, bias)
    dqkv_ref, dbias_ref = vjp(g)

    out, vjp_p = jax.vjp(
        lambda a, b: window_attention_v3(a, b, mask, nh, interpret=True),
        qkv, bias)
    ref_out = window_attention_reference(qkv, bias, mref, nh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)
    dqkv, dbias = vjp_p(g)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(dqkv_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(dbias_ref),
                               rtol=2e-4, atol=2e-4)
