"""ResNet / ResNeXt backbones (reference: mmdet/models/backbones/
resnet.py:663, resnext.py) — NHWC flax implementation.

Detection-style defaults mirror the reference: BN frozen in eval
semantics (``norm_eval=True`` → running stats always used; detection
fine-tuning never updates BN), ``frozen_stages`` gates gradient flow by
stop_gradient, deep_stem/caffe-style options omitted (pytorch style).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import BACKBONES

Dtype = Any


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride,
                      padding=[(self.dilation,) * 2] * 2,
                      kernel_dilation=self.dilation, use_bias=False,
                      dtype=self.dtype, name='conv1')(x)
        out = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                           dtype=jnp.float32, name='bn1')(out)
        out = nn.relu(out).astype(self.dtype)
        out = nn.Conv(self.planes, (3, 3), padding=[(1, 1)] * 2,
                      use_bias=False, dtype=self.dtype, name='conv2')(out)
        out = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                           dtype=jnp.float32, name='bn2')(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name='downsample.0')(x)
            identity = nn.BatchNorm(use_running_average=True,
                                    epsilon=1e-5, dtype=jnp.float32,
                                    name='downsample.1')(identity)
        return nn.relu(out + identity).astype(self.dtype)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    groups: int = 1
    base_width: int = 64
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                      name='conv1')(x)
        out = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                           dtype=jnp.float32, name='bn1')(out)
        out = nn.relu(out).astype(self.dtype)
        out = nn.Conv(width, (3, 3), strides=self.stride,
                      padding=[(self.dilation,) * 2] * 2,
                      kernel_dilation=self.dilation,
                      feature_group_count=self.groups, use_bias=False,
                      dtype=self.dtype, name='conv2')(out)
        out = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                           dtype=jnp.float32, name='bn2')(out)
        out = nn.relu(out).astype(self.dtype)
        out = nn.Conv(self.planes * self.expansion, (1, 1),
                      use_bias=False, dtype=self.dtype, name='conv3')(out)
        out = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                           dtype=jnp.float32, name='bn3')(out)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=self.stride, use_bias=False,
                               dtype=self.dtype, name='downsample.0')(x)
            identity = nn.BatchNorm(use_running_average=True,
                                    epsilon=1e-5, dtype=jnp.float32,
                                    name='downsample.1')(identity)
        return nn.relu(out + identity).astype(self.dtype)


ARCH_SETTINGS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


@BACKBONES.register_module()
class ResNet(nn.Module):
    """(reference: resnet.py). Returns tuple of NHWC stage features."""
    depth: int = 50
    in_channels: int = 3
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    groups: int = 1
    base_width: int = 64
    norm_eval: bool = True
    zero_init_residual: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        x = x.astype(self.dtype)
        x = nn.Conv(self.base_channels, (7, 7), strides=2,
                    padding=[(3, 3)] * 2, use_bias=False,
                    dtype=self.dtype, name='conv1')(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=jnp.float32, name='bn1')(x)
        x = nn.relu(x).astype(self.dtype)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        planes = self.base_channels
        for i, blocks in enumerate(stage_blocks[:self.num_stages]):
            stride = self.strides[i]
            dilation = self.dilations[i]
            for j in range(blocks):
                kwargs = {}
                if block_cls is Bottleneck:
                    kwargs = dict(groups=self.groups,
                                  base_width=self.base_width)
                x = block_cls(planes=planes,
                              stride=stride if j == 0 else 1,
                              downsample=(j == 0),
                              dilation=dilation, dtype=self.dtype,
                              name=f'layer{i + 1}.{j}',
                              **kwargs)(x, train=train)
            if i + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)


@BACKBONES.register_module()
class ResNeXt(ResNet):
    """(reference: resnext.py) — grouped bottlenecks; e.g.
    ResNeXt-101 32x4d via groups=32, base_width=4."""
    groups: int = 32
    base_width: int = 4
