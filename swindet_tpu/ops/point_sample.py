"""point_sample — bilinear sampling at arbitrary normalized points
(mmcv.ops.point_sample semantics; used by PointRend's point head).
grid_sample align_corners=False, zero padding.
"""
from __future__ import annotations

import jax.numpy as jnp


def point_sample(feats: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """feats (N, H, W, C); points (N, P, 2) in [0, 1] (x, y) →
    (N, P, C)."""
    n, h, w, c = feats.shape
    x = points[..., 0] * w - 0.5
    y = points[..., 1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0

    def tap(yy, xx):
        inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yc = jnp.clip(yy, 0, h - 1)
        xc = jnp.clip(xx, 0, w - 1)
        v = jnp.take_along_axis(
            feats.reshape(n, h * w, c),
            (yc * w + xc)[..., None], axis=1)
        return jnp.where(inside[..., None], v, 0.0)

    out = (tap(y0, x0) * ((1 - fy) * (1 - fx))[..., None]
           + tap(y0, x0 + 1) * ((1 - fy) * fx)[..., None]
           + tap(y0 + 1, x0) * (fy * (1 - fx))[..., None]
           + tap(y0 + 1, x0 + 1) * (fy * fx)[..., None])
    return out
