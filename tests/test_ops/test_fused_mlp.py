"""Fused fc1→GELU→fc2 kernel (ops/fused_mlp.py) vs the unfused oracle:
forward values and all five gradients, interpret mode; plus the
SWINDET_FUSED_MLP=1 Mlp-module route with an unchanged param tree."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from swindet_tpu.ops.fused_mlp import (fused_mlp, fused_mlp_reference)
from swindet_tpu.models.layers import Mlp


def _inputs(r=48, c=32, h=64, seed=0):
    rs = np.random.RandomState(seed)
    x = rs.randn(r, c).astype(np.float32) * 0.5
    w1 = rs.randn(c, h).astype(np.float32) * (c ** -0.5)
    b1 = rs.randn(h).astype(np.float32) * 0.1
    w2 = rs.randn(h, c).astype(np.float32) * (h ** -0.5)
    b2 = rs.randn(c).astype(np.float32) * 0.1
    return map(jnp.asarray, (x, w1, b1, w2, b2))


def test_fused_mlp_forward():
    x, w1, b1, w2, b2 = _inputs()
    ref = fused_mlp_reference(x, w1, b1, w2, b2)
    out = fused_mlp(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_mlp_grads():
    x, w1, b1, w2, b2 = _inputs(seed=1)

    def loss(fn, *a):
        out = fn(*a)
        return jnp.sum(out * jnp.sin(out * 0.3))

    g_ref = jax.grad(lambda *a: loss(fused_mlp_reference, *a),
                     argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_out = jax.grad(
        lambda *a: loss(lambda *b: fused_mlp(*b, interpret=True), *a),
        argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for nm, a, b in zip(['x', 'w1', 'b1', 'w2', 'b2'], g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=f'grad {nm}')


def test_mlp_module_flag_same_tree_and_output():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 16, 32).astype(np.float32))
    mod = Mlp(hidden_features=64, out_features=32)
    v_off = mod.init(jax.random.PRNGKey(0), x)
    out_off = mod.apply(v_off, x)
    os.environ['SWINDET_FUSED_MLP'] = '1'
    try:
        v_on = mod.init(jax.random.PRNGKey(0), x)
        same = jax.tree.map(lambda a, b: a.shape == b.shape,
                            v_off['params'], v_on['params'])
        assert all(jax.tree.leaves(same))
        out_on = mod.apply(v_off, x)
    finally:
        os.environ.pop('SWINDET_FUSED_MLP', None)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=2e-4, atol=2e-4)
