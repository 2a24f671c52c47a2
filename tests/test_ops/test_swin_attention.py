"""Fused full-map SW-MSA kernel vs lax spec (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swindet_tpu.ops.swin_attention import (swin_window_attention,
                                            swin_attention_reference)


@pytest.mark.parametrize('shift', [0, 3])
def test_fused_map_matches_reference(rng, shift):
    b, hp, wp, nh, hd, ws = 2, 21, 28, 2, 16, 7
    c = nh * hd
    qkv = jnp.asarray(rng.randn(b, hp, wp, 3 * c).astype(np.float32))
    bias = jnp.asarray(rng.randn(nh, ws * ws, ws * ws).astype(np.float32))
    ref = swin_attention_reference(qkv, bias, ws, shift, nh)
    out = swin_window_attention(qkv, bias, ws, shift, nh, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_matches_blockwise_path(rng):
    """Kernel (after unroll) must reproduce the original per-window
    pipeline (roll → partition → W-MSA → reverse → unroll) used by the
    SwinBlock lax fallback."""
    from swindet_tpu.models.backbones.swin import (window_partition,
                                                   window_reverse,
                                                   shifted_window_attn_mask)
    from swindet_tpu.ops.window_attention import window_attention_reference
    b, hp, wp, nh, hd, ws, shift = 1, 14, 21, 1, 8, 7, 3
    c = nh * hd
    qkv = jnp.asarray(rng.randn(b, hp, wp, 3 * c).astype(np.float32))

    # original pipeline
    y = jnp.roll(qkv, (-shift, -shift), axis=(1, 2))
    wins = window_partition(y, ws).reshape(-1, ws * ws, 3 * c)
    bias = jnp.asarray(rng.randn(nh, ws * ws, ws * ws).astype(np.float32))
    mask = jnp.asarray(shifted_window_attn_mask(hp, wp, ws, shift))
    attn = window_attention_reference(wins, bias, mask, nh)
    expected = window_reverse(attn.reshape(-1, ws, ws, c), ws, hp, wp)
    expected = jnp.roll(expected, (shift, shift), axis=(1, 2))

    out = swin_window_attention(qkv, bias, ws, shift, nh, interpret=True)
    out = jnp.roll(out, (shift, shift), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_grad_flows(rng):
    b, hp, wp, nh, hd, ws = 1, 14, 14, 2, 8, 7
    c = nh * hd
    qkv = jnp.asarray(rng.randn(b, hp, wp, 3 * c).astype(np.float32))
    bias = jnp.asarray(rng.randn(nh, ws * ws, ws * ws).astype(np.float32))

    def f(q, bi):
        return jnp.sum(swin_window_attention(q, bi, ws, 3, nh,
                                             interpret=True) ** 2)

    g_q, g_b = jax.grad(f, argnums=(0, 1))(qkv, bias)

    def f_ref(q, bi):
        return jnp.sum(swin_attention_reference(q, bi, ws, 3, nh) ** 2)

    rg_q, rg_b = jax.grad(f_ref, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(g_q), np.asarray(rg_q),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(rg_b),
                               rtol=1e-4, atol=1e-4)
