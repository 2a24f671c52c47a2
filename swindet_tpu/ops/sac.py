"""SAC — Switchable Atrous Convolution (reference: mmcv.ops.saconv
SAConv2d, used by DetectoRS — backbones/detectors_resnet.py:10;
arXiv:2006.02334).

Two atrous rates share one weight-standardized kernel (the large rate
adds a learnable ``weight_diff``); a spatial switch blends them.
Global pre/post context 1×1 convs bracket the op. All dense convs —
direct XLA mapping, no custom kernel."""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class SAConv2d(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_deform: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        d = self.dilation
        cin = x.shape[-1]
        weight = self.param('weight', nn.initializers.he_normal(),
                            (k, k, cin, self.out_channels))
        # AWS weight standardization (mmcv ConvAWS2d)
        gamma = self.param('weight_gamma', nn.initializers.ones,
                           (1, 1, 1, self.out_channels))
        beta = self.param('weight_beta', nn.initializers.zeros,
                          (1, 1, 1, self.out_channels))
        mean = weight.mean(axis=(0, 1, 2), keepdims=True)
        std = jnp.sqrt(weight.var(axis=(0, 1, 2), keepdims=True) + 1e-5)
        w = gamma * (weight - mean) / std + beta
        weight_diff = self.param('weight_diff', nn.initializers.zeros,
                                 (k, k, cin, self.out_channels))

        # pre-context: global avg 1x1 added to the input
        gap = x.mean(axis=(1, 2), keepdims=True)
        x = x + nn.Conv(cin, (1, 1), dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        name='pre_context')(gap)

        # switch from a 5x5 smoothed view (reflect pad, stride matches)
        avg = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)),
                      mode='reflect')
        avg = nn.avg_pool(avg, (5, 5), strides=(1, 1))
        switch = nn.Conv(1, (1, 1), strides=self.stride,
                         dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.ones,
                         name='switch')(avg)

        def conv_with(wt, dil):
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), wt.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(dil * (k // 2),) * 2] * 2,
                rhs_dilation=(dil, dil),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        out_s = conv_with(w, d)
        out_l = conv_with(w + weight_diff, 3 * d)
        out = switch * out_s + (1 - switch) * out_l

        # post-context
        gap = out.mean(axis=(1, 2), keepdims=True)
        out = out + nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            kernel_init=nn.initializers.zeros,
                            name='post_context')(gap)
        return out
