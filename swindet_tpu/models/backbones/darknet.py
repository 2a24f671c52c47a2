"""Darknet-53 backbone (reference: mmdet/models/backbones/darknet.py:56).

Conv-BN-LeakyReLU(0.1) stem + five conv(stride2)+ResBlock stages.
TPU-native NHWC flax; frozen stages via stop_gradient.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import BACKBONES
from ..layers import ConvModule

_ACT = dict(type='LeakyReLU', negative_slope=0.1)
_BN = dict(type='BN', requires_grad=True)

ARCH_SETTINGS = {
    53: ((1, 2, 8, 8, 4), ((32, 64), (64, 128), (128, 256), (256, 512),
                           (512, 1024))),
}


class ResBlock(nn.Module):
    """1x1 half-width conv + 3x3 conv + residual (reference :13)."""
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvModule(self.channels // 2, 1, norm_cfg=_BN,
                         act_cfg=_ACT, dtype=self.dtype,
                         name='conv1')(x, train=train)
        out = ConvModule(self.channels, 3, padding=1, norm_cfg=_BN,
                         act_cfg=_ACT, dtype=self.dtype,
                         name='conv2')(out, train=train)
        return out + residual


@BACKBONES.register_module()
class Darknet(nn.Module):
    depth: int = 53
    out_indices: Sequence[int] = (3, 4, 5)
    frozen_stages: int = -1
    norm_eval: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        layers, channels = ARCH_SETTINGS[self.depth]
        if self.norm_eval:
            train = False   # BN uses running stats (detection fine-tune)
        x = x.astype(self.dtype)
        x = ConvModule(32, 3, padding=1, norm_cfg=_BN, act_cfg=_ACT,
                       dtype=self.dtype, name='conv1')(x, train=train)
        outs = []
        if 0 in self.out_indices:
            outs.append(x)
        for i, n_res in enumerate(layers):
            out_c = channels[i][1]
            x = ConvModule(out_c, 3, stride=2, padding=1, norm_cfg=_BN,
                           act_cfg=_ACT, dtype=self.dtype,
                           name=f'conv_res_block{i + 1}_conv')(
                               x, train=train)
            for r in range(n_res):
                x = ResBlock(out_c, dtype=self.dtype,
                             name=f'conv_res_block{i + 1}_res{r}')(
                                 x, train=train)
            if i + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if i + 1 in self.out_indices:
                outs.append(x)
        return tuple(outs)
