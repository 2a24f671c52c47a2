"""Deformable convolution — gather-based bilinear sampling (TPU-native
stand-in for mmcv's DeformConv2d CUDA op; reference usage:
mmdet/models/dense_heads/reppoints_head.py:10,283-287).

Per output pixel, K = kh*kw taps are sampled at (base grid + predicted
offset) via bilinear interpolation (zero outside), then contracted with
the kernel: out[b,i,j,o] = Σ_k Σ_c w[k,c,o] · x̃[b, i+Δy_k, j+Δx_k, c].
The sampling is one flat row-gather per tap corner batched over taps —
XLA-friendly static shapes (SURVEY.md §2.9 DeformConv2d row).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def deform_sample(x: jnp.ndarray, sample_y: jnp.ndarray,
                  sample_x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample x (B, H, W, C) at (B, H, W, K) fractional
    positions; zero outside [−1, H/W] torch-style borders.
    Returns (B, H, W, K, C)."""
    b, h, w, c = x.shape
    k = sample_y.shape[-1]
    flat = x.reshape(b, h * w, c)

    valid = ((sample_y > -1.0) & (sample_y < h) &
             (sample_x > -1.0) & (sample_x < w))
    y = jnp.clip(sample_y, 0.0, h - 1.0)
    xx = jnp.clip(sample_x, 0.0, w - 1.0)
    y0 = jnp.floor(y)
    x0 = jnp.floor(xx)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    ly, lx = y - y0, xx - x0
    hy, hx = 1.0 - ly, 1.0 - lx

    ho, wo = sample_y.shape[1:3]

    def take(yy, xs):
        idx = (yy * w + xs).astype(jnp.int32).reshape(b, -1)
        return jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(
            flat, idx).reshape(b, ho, wo, k, c)

    out = (take(y0, x0) * (hy * hx)[..., None] +
           take(y0, x1) * (hy * lx)[..., None] +
           take(y1, x0) * (ly * hx)[..., None] +
           take(y1, x1) * (ly * lx)[..., None])
    return jnp.where(valid[..., None], out, 0.0)


class DeformConv2d(nn.Module):
    """torch-compatible deformable conv (kernel kh×kw, stride s, pad
    (kh//2, kw//2)); ``offset`` is (B, Ho, Wo, G*2*K) with (dy, dx)
    pairs in torch channel order, one offset set per deform group
    (input channels split into ``deform_groups`` consecutive slices).
    With ``mask`` (B, Ho, Wo, G*K) the op is DCNv2 (modulated): each
    bilinear sample is scaled by sigmoid(mask) — reference usage:
    ResNet dcn=dict(type='DCNv2') stages (configs/dcn/*mdconv*)."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: int = 1
    use_bias: bool = False
    deform_groups: int = 1
    dtype: Any = jnp.float32
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, offset: jnp.ndarray,
                 mask: jnp.ndarray = None) -> jnp.ndarray:
        b, h, w, c = x.shape
        kh, kw = self.kernel_size
        k = kh * kw
        dg = self.deform_groups
        base = np.stack(np.meshgrid(
            np.arange(kh) - kh // 2, np.arange(kw) - kw // 2,
            indexing='ij'), -1).reshape(k, 2)          # (K, 2) (dy, dx)
        grid_y = np.arange(0, h, self.stride)[:, None]
        grid_x = np.arange(0, w, self.stride)[None, :]
        ho, wo = len(grid_y), grid_x.shape[1]

        off = offset.astype(jnp.float32).reshape(b, ho, wo, dg, k, 2)
        sy = grid_y[None, :, :, None, None] + base[None, None, None,
                                                   None, :, 0] \
            + off[..., 0]                              # (B,H,W,G,K)
        sx = grid_x[None, :, :, None, None] + base[None, None, None,
                                                   None, :, 1] \
            + off[..., 1]

        xg = x.astype(jnp.float32).reshape(b, h, w, dg, c // dg)
        samples = []
        for gi in range(dg):                           # dg is 1 or 4
            samples.append(deform_sample(
                xg[:, :, :, gi], sy[:, :, :, gi], sx[:, :, :, gi]))
        samples = jnp.concatenate(samples, axis=-1)    # (B,Ho,Wo,K,C)
        if mask is not None:
            m = jax.nn.sigmoid(mask.astype(jnp.float32))
            m = m.reshape(b, ho, wo, dg, k)
            m = jnp.repeat(m, c // dg, axis=3).transpose(0, 1, 2, 4, 3) \
                .reshape(b, ho, wo, k, c)
            samples = samples * m
        weight = self.param(
            'weight', self.kernel_init or nn.initializers.he_normal(),
            (k, c, self.features))
        out = jnp.einsum('bhwkc,kcf->bhwf',
                         samples.astype(self.dtype),
                         weight.astype(self.dtype),
                         preferred_element_type=jnp.float32)
        if self.use_bias:
            out = out + self.param('bias', nn.initializers.zeros,
                                   (self.features,))
        return out.astype(self.dtype)


class ModulatedDeformConvPack(nn.Module):
    """DCNv2 with its own offset/mask predictor (mmcv
    ModulatedDeformConv2dPack): a zero-init conv produces
    (dy, dx, mask) per tap so the op starts as a plain conv. Used by
    NAS-FCOS towers and cells (reference: configs/nas_fcos/*,
    conv_cfg=dict(type='DCNv2', deform_groups=2))."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    deform_groups: int = 1
    use_bias: bool = True
    modulated: bool = True   # False = mmcv DeformConv2dPack (DCNv1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size * self.kernel_size
        dg = self.deform_groups
        per_tap = 3 if self.modulated else 2
        off = nn.Conv(dg * per_tap * k, (self.kernel_size,) * 2,
                      strides=self.stride,
                      padding=[(self.kernel_size // 2,) * 2] * 2,
                      dtype=jnp.float32,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name='conv_offset')(x)
        b, ho, wo, _ = off.shape
        if self.modulated:
            off3 = off.reshape(b, ho, wo, dg, 3, k)
            offset = off3[..., :2, :].transpose(0, 1, 2, 3, 5, 4) \
                .reshape(b, ho, wo, dg * 2 * k)
            mask = off3[..., 2, :].reshape(b, ho, wo, dg * k)
        else:
            offset, mask = off, None
        return DeformConv2d(self.features,
                            (self.kernel_size,) * 2,
                            stride=self.stride, deform_groups=dg,
                            use_bias=self.use_bias, dtype=self.dtype,
                            name='conv')(x, offset, mask)
