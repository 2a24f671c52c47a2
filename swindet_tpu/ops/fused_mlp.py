"""Fused token MLP — fc1 → GELU → fc2 in one Pallas kernel.

XLA materializes the (tokens, 4C) hidden activation in HBM between the
two GEMMs, in forward AND backward; for Swin the MLP hidden is the
single largest activation tensor. This kernel keeps the hidden in VMEM
per row-block: weights ride VMEM across the whole sequential grid
(constant block index → DMA'd once), the backward recomputes the
hidden flash-style and accumulates dW1/db1/dW2/db2 across grid steps.

Exact (erf) GELU to match nn.gelu(approximate=False)
(reference: swin_transformer.py:20 Mlp with nn.GELU).

Opt-in via SWINDET_FUSED_MLP=1 (models/layers.py Mlp) pending a
hardware profile against the XLA lowering.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_HALF = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327

# Mosaic has no `erf` primitive (KernelType.TC) — evaluate XLA's own f32
# rational approximation in-kernel instead (ErfImpl32,
# xla/hlo/builder/lib/math.cc: x·P(x²)/Q(x²) on x clamped to
# ±erfinv(1−2⁻²³)), so numerics match the XLA lowering of lax.erf.
_ERF_ALPHA = (0.00022905065861350646, 0.0034082910107109506,
              0.050955695062380861, 0.18520832239976145,
              1.128379143519084)
_ERF_BETA = (-1.1791602954361697e-7, 0.000023547966471313185,
             0.0010179625278914885, 0.014070470171167667,
             0.11098505178285362, 0.49746925110067538, 1.0)
_ERF_CLAMP = 3.832506856900711


def _erf(x):
    x = jnp.clip(x, -_ERF_CLAMP, _ERF_CLAMP)
    x2 = x * x
    p = jnp.float32(_ERF_ALPHA[0])
    for c in _ERF_ALPHA[1:]:
        p = p * x2 + jnp.float32(c)
    q = jnp.float32(_ERF_BETA[0])
    for c in _ERF_BETA[1:]:
        q = q * x2 + jnp.float32(c)
    return (x * p) / q


def _gelu(h):
    return 0.5 * h * (1.0 + _erf(h * _SQRT_HALF))


def _gelu_grad(h):
    cdf = 0.5 * (1.0 + _erf(h * _SQRT_HALF))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * h * h)
    return cdf + h * pdf


def _pick_rows(n_rows: int, cap: int = 512) -> int:
    """Largest multiple-of-8 divisor of ``n_rows`` ≤ cap.

    Mosaic requires the second-to-last block dim be a multiple of 8
    (sublane) unless it equals the array dim; callers pre-pad
    ``n_rows`` to a multiple of 8 so a valid block always exists.
    """
    best = min(8, n_rows)
    for r in range(8, min(cap, n_rows) + 1, 8):
        if n_rows % r == 0:
            best = r
    return best


# ------------------------------------------------------------------ fwd
def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[:]
    h = jax.lax.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[0][None]
    a = _gelu(h).astype(x.dtype)
    o = jax.lax.dot(a, w2_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (o + b2_ref[0][None]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def _mlp_fwd_impl(x, w1, b1, w2, b2, interpret=False):
    r, c = x.shape
    hdim = w1.shape[1]
    rows = _pick_rows(r)
    grid = (r // rows,)
    blk = lambda i: (i, 0)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        _mlp_kernel,
        out_shape=jax.ShapeDtypeStruct((r, w2.shape[1]), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, c), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hdim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, w2.shape[1]), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w2.shape[1]), const,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, w2.shape[1]), blk,
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


# ------------------------------------------------------------------ bwd
def _mlp_bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, g_ref,
                    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    x = x_ref[:]
    g = g_ref[:].astype(jnp.float32)
    h = jax.lax.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[0][None]
    a = _gelu(h)
    dw2_ref[:] += jax.lax.dot_general(
        a.astype(x.dtype), g.astype(x.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(g, axis=0, keepdims=True)
    da = jax.lax.dot_general(
        g.astype(x.dtype), w2_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = (da * _gelu_grad(h)).astype(x.dtype)
    dw1_ref[:] += jax.lax.dot_general(
        x, dh, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(dh.astype(jnp.float32), axis=0,
                          keepdims=True)
    dx = jax.lax.dot_general(
        dh, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def _mlp_bwd_impl(x, w1, b1, w2, g, interpret=False):
    r, c = x.shape
    hdim = w1.shape[1]
    co = w2.shape[1]
    rows = _pick_rows(r, cap=256)
    grid = (r // rows,)
    blk = lambda i: (i, 0)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        _mlp_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((r, c), x.dtype),
            jax.ShapeDtypeStruct((c, hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, hdim), jnp.float32),
            jax.ShapeDtypeStruct((hdim, co), jnp.float32),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, c), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hdim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, co), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, co), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, c), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hdim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, co), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), const, memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, w1, b1.reshape(1, -1), w2, g)


# ------------------------------------------------------------ public op
def fused_mlp(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray, b2: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """gelu(x @ w1 + b1) @ w2 + b2, hidden never leaves VMEM.

    x: (..., C); weights in flax Dense layout. Differentiable.
    """
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1])
    r = xf.shape[0]
    r8 = -(-r // 8) * 8  # pad rows to the Mosaic sublane multiple;
    if r8 != r:          # zero rows contribute zero to every grad.
        xf = jnp.pad(xf, ((0, r8 - r), (0, 0)))
    out = _fused_mlp_vjp(xf,
                         w1.astype(x.dtype), b1.astype(jnp.float32),
                         w2.astype(x.dtype), b2.astype(jnp.float32),
                         interpret)
    if r8 != r:
        out = out[:r]
    return out.reshape(lead + (w2.shape[1],))


def fused_mlp_reference(x, w1, b1, w2, b2):
    h = x @ w1.astype(x.dtype) + b1.astype(x.dtype)
    a = jax.nn.gelu(h.astype(jnp.float32), approximate=False) \
        .astype(x.dtype)
    return a @ w2.astype(x.dtype) + b2.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_mlp_vjp(x, w1, b1, w2, b2, interpret):
    return _mlp_fwd_impl(x, w1, b1, w2, b2, interpret)


def _fused_mlp_fwd(x, w1, b1, w2, b2, interpret):
    return _mlp_fwd_impl(x, w1, b1, w2, b2, interpret), (x, w1, b1, w2)


def _fused_mlp_bwd(interpret, res, g):
    x, w1, b1, w2 = res
    dx, dw1, db1, dw2, db2 = _mlp_bwd_impl(x, w1, b1, w2, g, interpret)
    return (dx, dw1.astype(w1.dtype), db1.reshape(-1),
            dw2.astype(w2.dtype), db2.reshape(-1))


_fused_mlp_vjp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
