"""v4 fully-fused window attention (qkv GEMM + attention + out-proj in
one Pallas kernel, ops/window_attention_v4.py) vs the unfused oracle:
forward values and every gradient (x, Wqkv, bqkv, rel-pos bias, Wproj,
bproj), with and without a shift mask, in interpret mode."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from swindet_tpu.ops.window_attention_v4 import (
    window_attention_v4, window_attention_v4_reference)


def _inputs(b_=4, n=16, c=32, nh=2, nw=2, with_mask=True, seed=0):
    rs = np.random.RandomState(seed)
    x = rs.randn(b_, n, c).astype(np.float32) * 0.5
    wqkv = rs.randn(c, 3 * c).astype(np.float32) * (c ** -0.5)
    bqkv = rs.randn(3 * c).astype(np.float32) * 0.1
    bias = rs.randn(nh, n, n).astype(np.float32) * 0.2
    mask = None
    if with_mask:
        mask = np.where(rs.rand(nw, n, n) > 0.7, -100.0, 0.0) \
            .astype(np.float32)
    wproj = rs.randn(c, c).astype(np.float32) * (c ** -0.5)
    bproj = rs.randn(c).astype(np.float32) * 0.1
    return x, wqkv, bqkv, bias, mask, wproj, bproj


@pytest.mark.parametrize('with_mask', [False, True])
def test_v4_forward_parity(with_mask):
    x, wqkv, bqkv, bias, mask, wproj, bproj = _inputs(
        with_mask=with_mask)
    ref = window_attention_v4_reference(
        jnp.asarray(x), jnp.asarray(wqkv), jnp.asarray(bqkv),
        jnp.asarray(bias), None if mask is None else jnp.asarray(mask),
        jnp.asarray(wproj), jnp.asarray(bproj), num_heads=2)
    out = window_attention_v4(
        jnp.asarray(x), jnp.asarray(wqkv), jnp.asarray(bqkv),
        jnp.asarray(bias), None if mask is None else jnp.asarray(mask),
        jnp.asarray(wproj), jnp.asarray(bproj), num_heads=2,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('with_mask', [False, True])
def test_v4_grad_parity(with_mask):
    x, wqkv, bqkv, bias, mask, wproj, bproj = _inputs(
        with_mask=with_mask)
    args = (jnp.asarray(x), jnp.asarray(wqkv), jnp.asarray(bqkv),
            jnp.asarray(bias),
            None if mask is None else jnp.asarray(mask),
            jnp.asarray(wproj), jnp.asarray(bproj))

    def loss_ref(x_, wqkv_, bqkv_, bias_, wproj_, bproj_):
        out = window_attention_v4_reference(
            x_, wqkv_, bqkv_, bias_, args[4], wproj_, bproj_,
            num_heads=2)
        return jnp.sum(out * jnp.cos(out * 0.1))

    def loss_v4(x_, wqkv_, bqkv_, bias_, wproj_, bproj_):
        out = window_attention_v4(
            x_, wqkv_, bqkv_, bias_, args[4], wproj_, bproj_,
            num_heads=2, interpret=True)
        return jnp.sum(out * jnp.cos(out * 0.1))

    diff_args = (args[0], args[1], args[2], args[3], args[5], args[6])
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*diff_args)
    g_v4 = jax.grad(loss_v4, argnums=tuple(range(6)))(*diff_args)
    names = ['x', 'wqkv', 'bqkv', 'bias', 'wproj', 'bproj']
    for nm, a, b in zip(names, g_v4, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f'grad {nm}')


def test_v4_odd_window_count():
    # B_ not divisible by the block cap → wblk falls back to 1
    x, wqkv, bqkv, bias, mask, wproj, bproj = _inputs(
        b_=3, nw=3, with_mask=True, seed=1)
    ref = window_attention_v4_reference(
        jnp.asarray(x), jnp.asarray(wqkv), jnp.asarray(bqkv),
        jnp.asarray(bias), jnp.asarray(mask), jnp.asarray(wproj),
        jnp.asarray(bproj), num_heads=2)
    out = window_attention_v4(
        jnp.asarray(x), jnp.asarray(wqkv), jnp.asarray(bqkv),
        jnp.asarray(bias), jnp.asarray(mask), jnp.asarray(wproj),
        jnp.asarray(bproj), num_heads=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
