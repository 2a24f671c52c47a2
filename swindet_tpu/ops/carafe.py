"""CARAFE — content-aware reassembly upsampling (reference:
mmcv.ops.carafe CARAFEPack, used by FPN_CARAFE — necks/fpn_carafe.py;
arXiv:1905.02188).

The reference's CUDA kernel gathers a k_up×k_up input patch per output
pixel; here reassembly is expressed as dense patch extraction
(`conv_general_dilated_patches`) + a broadcast einsum with the
softmax-normalized predicted kernels — all MXU/VPU work, no gathers.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


def carafe(x: jnp.ndarray, kernels: jnp.ndarray, k_up: int,
           scale: int) -> jnp.ndarray:
    """x (B, H, W, C); kernels (B, sH, sW, k_up²) softmax-normalized →
    (B, sH, sW, C). Output pixel (i, j) reassembles the k_up×k_up
    input patch centered at its source pixel (i//s, j//s)."""
    b, h, w, c = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x, (k_up, k_up), (1, 1),
        [(k_up // 2, k_up // 2)] * 2,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))     # (B,H,W,C*k²)
    patches = patches.reshape(b, h, w, c, k_up * k_up)
    # nearest-upsample the patch tensor to output resolution
    patches = jnp.repeat(jnp.repeat(patches, scale, axis=1), scale,
                         axis=2)                        # (B,sH,sW,C,k²)
    return jnp.einsum('bhwck,bhwk->bhwc', patches, kernels)


class CARAFEPack(nn.Module):
    """Kernel-prediction + reassembly block (mmcv CARAFEPack)."""
    channels: int
    scale_factor: int = 2
    up_kernel: int = 5
    up_group: int = 1
    encoder_kernel: int = 3
    encoder_dilation: int = 1
    compressed_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = self.scale_factor
        k = self.up_kernel
        comp = nn.Conv(self.compressed_channels, (1, 1),
                       dtype=self.dtype, name='channel_compressor')(x)
        enc = nn.Conv(
            self.up_group * k * k * s * s,
            (self.encoder_kernel, self.encoder_kernel),
            padding=[((self.encoder_kernel - 1) // 2
                      * self.encoder_dilation,) * 2] * 2,
            kernel_dilation=(self.encoder_dilation,) * 2,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name='content_encoder')(comp)
        b, h, w, _ = enc.shape
        # pixel shuffle: (B,H,W,k²·s²) → (B,sH,sW,k²)
        enc = enc.reshape(b, h, w, s, s, k * k)
        enc = enc.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h * s, w * s, k * k)
        kernels = jax.nn.softmax(enc.astype(jnp.float32), axis=-1)
        return carafe(x.astype(jnp.float32), kernels, k, s) \
            .astype(x.dtype)
