"""Fused LayerNorm kernel vs lax spec + flax LayerNorm."""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from swindet_tpu.ops.layer_norm import (FusedLayerNorm, layer_norm,
                                        layer_norm_reference)


def test_matches_flax_layernorm(rng):
    x = jnp.asarray(rng.randn(37, 96).astype(np.float32))
    s = jnp.asarray(rng.randn(96).astype(np.float32))
    b = jnp.asarray(rng.randn(96).astype(np.float32))
    ref = nn.LayerNorm(epsilon=1e-5).apply(
        {'params': {'scale': s, 'bias': b}}, x)
    out = layer_norm(x, s, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_nondivisible_tokens(rng):
    x = jnp.asarray(rng.randn(3, 11, 13, 32).astype(np.float32))
    s = jnp.ones(32)
    b = jnp.zeros(32)
    ref = layer_norm_reference(x, s, b)
    out = layer_norm(x, s, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grad(rng):
    x = jnp.asarray(rng.randn(64, 48).astype(np.float32))
    s = jnp.asarray(rng.randn(48).astype(np.float32))
    b = jnp.asarray(rng.randn(48).astype(np.float32))
    g1 = jax.grad(lambda *a: jnp.sum(layer_norm(*a, interpret=True) ** 2),
                  argnums=(0, 1, 2))(x, s, b)
    g2 = jax.grad(lambda *a: jnp.sum(layer_norm_reference(*a) ** 2),
                  argnums=(0, 1, 2))(x, s, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_module_param_names(rng):
    """FusedLayerNorm params must be named scale/bias (checkpoint
    compatible with nn.LayerNorm)."""
    m = FusedLayerNorm(use_fused=False)
    v = m.init(jax.random.PRNGKey(0), jnp.ones((2, 8)))
    assert set(v['params'].keys()) == {'scale', 'bias'}
