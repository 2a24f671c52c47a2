"""Res2Net backbone (reference: mmdet/models/backbones/res2net.py:17 —
Bottle2neck: the 3x3 conv becomes a hierarchy of `scales` width-sliced
convs with cumulative residual connections).

NHWC flax; same detection conventions as resnet.py (BN running stats,
stop_gradient freezing).
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import BACKBONES

Dtype = Any


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    scales: int = 4
    base_width: int = 26
    base_channels: int = 64
    stage_type: str = 'normal'   # 'stage' for the first block of a stage
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(math.floor(
            self.planes * (self.base_width / self.base_channels)))
        identity = x
        out = nn.Conv(width * self.scales, (1, 1), use_bias=False,
                      dtype=self.dtype, name='conv1')(x)
        out = _bn('bn1')(out)
        out = nn.relu(out).astype(self.dtype)

        # width-sliced hierarchical convs (reference forward :108)
        spx = jnp.split(out, self.scales, axis=-1)
        sp = nn.Conv(width, (3, 3), strides=self.stride,
                     padding=[(self.dilation,) * 2] * 2,
                     kernel_dilation=self.dilation, use_bias=False,
                     dtype=self.dtype, name='convs0')(spx[0])
        sp = nn.relu(_bn('bns0')(sp)).astype(self.dtype)
        outs = [sp]
        for i in range(1, self.scales - 1):
            if self.stage_type == 'stage':
                sp = spx[i]
            else:
                sp = sp + spx[i]
            sp = nn.Conv(width, (3, 3), strides=self.stride,
                         padding=[(self.dilation,) * 2] * 2,
                         kernel_dilation=self.dilation, use_bias=False,
                         dtype=self.dtype, name=f'convs{i}')(sp)
            sp = nn.relu(_bn(f'bns{i}')(sp)).astype(self.dtype)
            outs.append(sp)
        last = spx[self.scales - 1]
        if self.stage_type == 'normal' or self.stride == 1:
            outs.append(last)
        else:
            # 'stage' with stride: avg-pool the untouched slice
            outs.append(nn.avg_pool(
                last, (3, 3), strides=(self.stride,) * 2,
                padding=[(1, 1)] * 2, count_include_pad=False))
        out = jnp.concatenate(outs, axis=-1)

        out = nn.Conv(self.planes * self.expansion, (1, 1),
                      use_bias=False, dtype=self.dtype, name='conv3')(out)
        out = _bn('bn3')(out)
        if self.downsample:
            # Res2Net downsample: avgpool + 1x1/s1 conv (the released
            # res2net weights use this layout)
            if self.stride != 1:
                identity = nn.avg_pool(
                    identity, (self.stride,) * 2,
                    strides=(self.stride,) * 2, count_include_pad=False)
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               use_bias=False, dtype=self.dtype,
                               name='downsample.0')(identity)
            identity = _bn('downsample.1')(identity)
        return nn.relu(out + identity).astype(self.dtype)


ARCH = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}


@BACKBONES.register_module()
class Res2Net(nn.Module):
    """(reference: res2net.py:238 — res2net50_26w_4s family)."""
    depth: int = 50
    scales: int = 4
    base_width: int = 26
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    norm_eval: bool = True
    deep_stem: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stage_blocks = ARCH[self.depth][:self.num_stages]
        x = x.astype(self.dtype)
        # res2net uses a deep 3-conv stem (reference res2net.py:305)
        c = self.base_channels
        if self.deep_stem:
            for i, (ch, s) in enumerate([(c // 2, 2), (c // 2, 1),
                                         (c, 1)]):
                x = nn.Conv(ch, (3, 3), strides=s, padding=[(1, 1)] * 2,
                            use_bias=False, dtype=self.dtype,
                            name=f'stem{i}')(x)
                x = _bn(f'stem_bn{i}')(x)
                x = nn.relu(x).astype(self.dtype)
        else:
            x = nn.Conv(c, (7, 7), strides=2, padding=[(3, 3)] * 2,
                        use_bias=False, dtype=self.dtype,
                        name='conv1')(x)
            x = _bn('bn1')(x)
            x = nn.relu(x).astype(self.dtype)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        planes = c
        for si, n_blocks in enumerate(stage_blocks):
            for bi in range(n_blocks):
                first = bi == 0
                x = Bottle2neck(
                    planes=planes,
                    stride=self.strides[si] if first else 1,
                    downsample=first,
                    dilation=self.dilations[si],
                    scales=self.scales, base_width=self.base_width,
                    base_channels=self.base_channels,
                    stage_type='stage' if first else 'normal',
                    dtype=self.dtype,
                    name=f'layer{si + 1}.{bi}')(x, train=train)
            if si + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if si in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
