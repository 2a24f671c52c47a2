"""One-pass LayerNorm Pallas kernel (bf16 IO, fp32 statistics).

XLA lowers flax LayerNorm on bf16 inputs to convert→reduce fusions that
dominate the Swin backbone schedule (profiled 8.6 ms / 34 LNs per
800×1344 forward — ~5× over bandwidth). This kernel reads each token
row once, computes mean/var in fp32 registers, and writes the
normalized bf16 row — one HBM pass at memory speed.

Used by the Swin backbone on TPU; the lax path remains for CPU/tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)                 # (TOK, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    y = (x - mean) * inv
    y = y * scale_ref[:].astype(jnp.float32)[None] \
        + bias_ref[:].astype(jnp.float32)[None]
    out_ref[:] = y.astype(out_ref.dtype)


def layer_norm_reference(x, scale, bias, eps=1e-5):
    """lax spec (fp32 stats) for parity tests + VJP recompute."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5, interpret: bool = False) -> jnp.ndarray:
    """Differentiable fused LN over the last axis of any-rank ``x``."""
    return _ln_vjp(x, scale, bias, eps, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln_vjp(x, scale, bias, eps, interpret):
    return _ln_fwd_impl(x, scale, bias, eps, interpret)


def _ln_vjp_fwd(x, scale, bias, eps, interpret):
    return _ln_fwd_impl(x, scale, bias, eps, interpret), (x, scale, bias)


def _ln_vjp_bwd(eps, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda a, s, b: layer_norm_reference(a, s, b, eps), x, scale, bias)
    return vjp(g)


_ln_vjp.defvjp(_ln_vjp_fwd, _ln_vjp_bwd)


@functools.partial(jax.jit, static_argnames=('eps', 'interpret'))
def _ln_fwd_impl(x, scale, bias, eps, interpret):
    shape = x.shape
    c = shape[-1]
    tokens = 1
    for s in shape[:-1]:
        tokens *= s
    xf = x.reshape(tokens, c)

    # VMEM gate: the kernel holds ~12 B/element (bf16 in+out + fp32
    # working copies); wide rows (Swin-B stage-3 merge norm is C=2048)
    # overflow the 16 MB scoped budget at the default 1024-row block
    tok_blk = min(1024, tokens,
                  max(8, (10_000_000 // (12 * c)) // 8 * 8))
    grid = (pl.cdiv(tokens, tok_blk),)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((tokens, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tok_blk, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tok_blk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xf, scale, bias)
    return out.reshape(shape)


class FusedLayerNorm(nn.Module):
    """flax module: Pallas LN on TPU, lax spec elsewhere. Param names
    (scale/bias) match nn.LayerNorm for checkpoint compatibility."""
    epsilon: float = 1e-5
    dtype: 'jnp.dtype' = jnp.float32
    use_fused: bool = None  # None = auto (TPU)

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        fused = self.use_fused
        if fused is None:
            fused = jax.default_backend() == 'tpu'
        x = x.astype(self.dtype)
        if fused:
            return layer_norm(x, scale, bias, self.epsilon)
        return layer_norm_reference(x, scale, bias, self.epsilon)
