"""torch-exact separable bicubic resize.

``torch.nn.functional.interpolate(mode='bicubic', align_corners=False)``
uses the Keys cubic-convolution kernel with a = -0.75 and half-pixel
coordinate mapping with border-replicate taps. jax.image.resize's
'bicubic' uses a = -0.5, which diverges from converted torch weights
(absolute_pos_embed, bias tables). Golden parity
(tests/test_golden/test_backbone_parity.py) pins this implementation to
the reference's F.interpolate (swin_transformer.py:607).

The resize is expressed as two static weight matrices applied with
einsum — MXU-friendly and constant-folded under jit.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    at = np.abs(t)
    w = np.where(
        at <= 1.0,
        (a + 2.0) * at ** 3 - (a + 3.0) * at ** 2 + 1.0,
        np.where(at < 2.0,
                 a * at ** 3 - 5.0 * a * at ** 2 + 8.0 * a * at - 4.0 * a,
                 0.0))
    return w


def bicubic_weights(in_size: int, out_size: int,
                    align_corners: bool = False) -> np.ndarray:
    """(out_size, in_size) interpolation matrix matching torch bicubic."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    if align_corners and out_size > 1:
        centers = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        centers = (np.arange(out_size) + 0.5) * scale - 0.5
    ifloor = np.floor(centers).astype(np.int64)
    frac = centers - ifloor
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for k in range(4):
        idx = np.clip(ifloor - 1 + k, 0, in_size - 1)
        wk = _cubic_kernel(frac - (k - 1.0))
        np.add.at(mat, (np.arange(out_size), idx), wk)
    return mat.astype(np.float32)


def torch_bicubic_resize(x, out_hw, align_corners: bool = False):
    """Resize (..., H, W, C) [jnp or np] to (..., out_h, out_w, C)."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    wh = bicubic_weights(h, oh, align_corners)
    ww = bicubic_weights(w, ow, align_corners)
    if isinstance(x, np.ndarray):
        return np.einsum('oh,pw,...hwc->...opc', wh, ww,
                         x.astype(np.float32))
    return jnp.einsum('oh,pw,...hwc->...opc', jnp.asarray(wh),
                      jnp.asarray(ww), x.astype(jnp.float32))


def bilinear_weights(in_size: int, out_size: int,
                     align_corners: bool = False) -> np.ndarray:
    """(out_size, in_size) matrix matching torch F.interpolate
    'bilinear'. align_corners=True maps output i to input
    i*(in-1)/(out-1) (corner-aligned — the HTC/SCNet semantic fusion
    and feature-relay upsample, fused_semantic_head.py:92,
    feature_relay_head.py:38); False is half-pixel like
    jax.image.resize."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    if align_corners and out_size > 1:
        centers = (np.arange(out_size) * (in_size - 1)
                   / max(out_size - 1, 1))
    else:
        scale = in_size / out_size
        centers = np.clip((np.arange(out_size) + 0.5) * scale - 0.5,
                          0, None)
    ifloor = np.floor(centers).astype(np.int64)
    frac = centers - ifloor
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    i0 = np.clip(ifloor, 0, in_size - 1)
    i1 = np.clip(ifloor + 1, 0, in_size - 1)
    np.add.at(mat, (np.arange(out_size), i0), 1.0 - frac)
    np.add.at(mat, (np.arange(out_size), i1), frac)
    return mat.astype(np.float32)


def torch_bilinear_resize(x, out_hw, align_corners: bool = False):
    """Resize (..., H, W, C) to (..., out_h, out_w, C) with torch
    F.interpolate bilinear semantics (separable weight matmuls —
    MXU-shaped, constant-folded under jit)."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    wh = bilinear_weights(h, oh, align_corners)
    ww = bilinear_weights(w, ow, align_corners)
    dt = x.dtype
    return jnp.einsum('oh,pw,...hwc->...opc', jnp.asarray(wh),
                      jnp.asarray(ww),
                      x.astype(jnp.float32)).astype(dt)
