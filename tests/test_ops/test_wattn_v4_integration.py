"""SWINDET_WATTN_V4=1 routes WindowAttention through the fully-fused
kernel with an UNCHANGED param tree and matching outputs (CPU uses the
unfused oracle; the kernel itself is parity-tested in
test_window_attention_v4.py)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swindet_tpu.models.backbones.swin import WindowAttention


@pytest.mark.parametrize('qkv_bias', [True, False])
def test_v4_flag_same_tree_and_output(qkv_bias):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(4, 16, 32).astype(np.float32))
    mask = jnp.asarray(
        np.where(rs.rand(2, 16, 16) > 0.7, -100.0, 0.0)
        .astype(np.float32))
    mod = WindowAttention(dim=32, window_size=(4, 4), num_heads=2,
                          qkv_bias=qkv_bias)
    v_off = mod.init(jax.random.PRNGKey(0), x, mask)
    out_off = mod.apply(v_off, x, mask)
    os.environ['SWINDET_WATTN_V4'] = '1'
    try:
        v_on = mod.init(jax.random.PRNGKey(0), x, mask)
        same = jax.tree.map(lambda a, b: a.shape == b.shape,
                            v_off['params'], v_on['params'])
        assert all(jax.tree.leaves(same))
        out_on = mod.apply(v_off, x, mask)   # off-params run the v4 path
    finally:
        os.environ.pop('SWINDET_WATTN_V4', None)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=2e-4, atol=2e-4)
