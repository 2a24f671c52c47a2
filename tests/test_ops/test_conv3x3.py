"""Pallas 3x3 conv kernel vs lax conv (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swindet_tpu.ops.conv3x3 import conv3x3, conv3x3_reference


@pytest.mark.parametrize('h,w_,relu', [(16, 24, True), (25, 21, False)])
def test_conv3x3_matches_lax(rng, h, w_, relu):
    x = jnp.asarray(rng.randn(2, h, w_, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 32, 16).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    ref = conv3x3_reference(x, w, b, relu)
    out = conv3x3(x, w, b, relu, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('relu', [True, False])
def test_conv3x3_grad(rng, relu):
    """interpret=True routes through the Pallas backward (dx = flipped-
    weight Pallas conv, dw = row-block accumulation kernel)."""
    x = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32))
    b = jnp.zeros(8)
    g1 = jax.grad(lambda *a: jnp.sum(conv3x3(*a, relu, True) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(lambda *a: jnp.sum(conv3x3_reference(*a, relu) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_conv3x3_grad_rect_multibatch(rng):
    """Rectangular H!=W, B>1, Cin!=Cout: exercises the dw kernel's halo
    rows, W zero-pad columns, and cross-batch accumulation."""
    x = jnp.asarray(rng.randn(3, 24, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    g1 = jax.grad(lambda *a: jnp.sum(conv3x3(*a, True, True) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(lambda *a: jnp.sum(conv3x3_reference(*a, True) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)
