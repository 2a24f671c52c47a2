"""CornerPool (reference: mmcv.ops.CornerPool, used by CornerNet —
corner_head.py:16 BiCornerPool).

The reference ships per-direction CUDA kernels; the operation is a
directional running max, which is exactly ``jax.lax.cummax`` with
``reverse`` — a single fused scan on TPU (log-depth associative scan
under the hood), no custom kernel needed.

Directions (NHWC):
    top:    out[y] = max_{y' >= y} x[y']   (reverse cummax over H)
    bottom: out[y] = max_{y' <= y} x[y']   (cummax over H)
    left:   out[x] = max_{x' >= x} x[x']   (reverse cummax over W)
    right:  out[x] = max_{x' <= x} x[x']   (cummax over W)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_DIRS = {
    'top': (1, True),
    'bottom': (1, False),
    'left': (2, True),
    'right': (2, False),
}


def corner_pool(x: jnp.ndarray, direction: str) -> jnp.ndarray:
    """x: (B, H, W, C) NHWC."""
    axis, reverse = _DIRS[direction]
    return jax.lax.cummax(x, axis=axis, reverse=reverse)
