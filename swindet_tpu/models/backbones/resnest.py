"""ResNeSt backbone (reference: mmdet/models/backbones/resnest.py:273;
arXiv:2004.08955) — ResNetV1d stem (3×3×3 deep stem, avg-down
shortcuts) with split-attention bottlenecks (radix softmax over
channel splits) and avg-pool stride.

TPU-native: split attention is a reshape + softmax over the radix axis
— pure matmul/VPU work; BN runs frozen (use_running_average) matching
this repo's backbone convention."""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import BACKBONES


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


class SplitAttentionConv2d(nn.Module):
    """(reference: resnest.py:39)."""
    channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    radix: int = 2
    reduction_factor: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = self.radix
        c = self.channels
        inter = max(x.shape[-1] * r // self.reduction_factor, 32)
        pad = self.dilation * (self.kernel_size // 2)
        out = nn.Conv(c * r, (self.kernel_size, self.kernel_size),
                      strides=self.stride, padding=[(pad, pad)] * 2,
                      kernel_dilation=self.dilation,
                      feature_group_count=self.groups * r,
                      use_bias=False, dtype=self.dtype, name='conv')(x)
        out = _bn('norm0')(out).astype(self.dtype)
        out = nn.relu(out)
        b, h, w, _ = out.shape
        if r > 1:
            # torch splits channel-major: (B, r, C) on NCHW ⇒ NHWC
            # channels group as [split0 | split1 | ...]
            splits = out.reshape(b, h, w, r, c)
            gap = splits.sum(axis=3)
        else:
            gap = out
        gap = gap.mean(axis=(1, 2))                       # (B, C)
        gap = nn.Conv(inter, (1, 1), feature_group_count=self.groups,
                      dtype=self.dtype,
                      name='fc1')(gap[:, None, None, :])
        gap = nn.relu(_bn('norm1')(gap).astype(self.dtype))
        atten = nn.Conv(c * r, (1, 1),
                        feature_group_count=self.groups,
                        dtype=self.dtype, name='fc2')(gap)[:, 0, 0, :]
        if r > 1:
            # radix softmax (reference RSoftmax): softmax over radix
            # within each group
            a = atten.reshape(b, r, self.groups, c // self.groups)
            a = jax.nn.softmax(a.astype(jnp.float32), axis=1)
            a = a.reshape(b, r, c).astype(self.dtype)
            return jnp.einsum('bhwrc,brc->bhwc', splits, a)
        a = jax.nn.sigmoid(atten.astype(jnp.float32)).astype(self.dtype)
        return out * a[:, None, None, :]


class SplitBottleneck(nn.Module):
    """(reference: resnest.py:149)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 4
    base_channels: int = 64
    radix: int = 2
    reduction_factor: int = 4
    avg_down_stride: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.groups == 1:
            width = self.planes
        else:
            width = int(math.floor(
                self.planes * (self.base_width / self.base_channels))
                * self.groups)
        avd = self.avg_down_stride and self.stride > 1
        identity = x
        out = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                      name='conv1')(x)
        out = nn.relu(_bn('bn1')(out).astype(self.dtype))
        out = SplitAttentionConv2d(
            width, 3, stride=1 if avd else self.stride,
            groups=self.groups, radix=self.radix,
            reduction_factor=self.reduction_factor, dtype=self.dtype,
            name='conv2')(out)
        if avd:
            out = nn.avg_pool(out, (3, 3), strides=(self.stride,) * 2,
                              padding=[(1, 1), (1, 1)])
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name='conv3')(out)
        out = _bn('bn3')(out).astype(self.dtype)
        if self.downsample:
            # ResNetV1d avg-down shortcut
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride,) * 2,
                                       strides=(self.stride,) * 2)
            identity = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                               dtype=self.dtype,
                               name='downsample.0')(identity)
            identity = _bn('downsample.1')(identity).astype(self.dtype)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class ResNeSt(nn.Module):
    depth: int = 50
    groups: int = 1
    base_width: int = 4
    radix: int = 2
    reduction_factor: int = 4
    avg_down_stride: bool = True
    base_channels: int = 64
    stem_channels: int = 64
    num_stages: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    norm_cfg: Any = None
    norm_eval: bool = True
    dtype: Any = jnp.float32

    ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3),
            200: (3, 24, 36, 3)}

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks = self.ARCH[self.depth][:self.num_stages]
        sc = self.stem_channels
        # deep stem: three 3x3 convs (ResNetV1d)
        for i, (c, s) in enumerate([(sc // 2, 2), (sc // 2, 1),
                                    (sc, 1)]):
            x = nn.Conv(c, (3, 3), strides=s, padding=[(1, 1)] * 2,
                        use_bias=False, dtype=self.dtype,
                        name=f'stem.{i * 3}')(x)
            x = nn.relu(_bn(f'stem.{i * 3 + 1}')(x).astype(self.dtype))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        outs = []
        planes = self.base_channels
        for si, n in enumerate(blocks):
            stride = 1 if si == 0 else 2
            for bi in range(n):
                x = SplitBottleneck(
                    planes, stride=stride if bi == 0 else 1,
                    downsample=(bi == 0),
                    groups=self.groups, base_width=self.base_width,
                    base_channels=self.base_channels, radix=self.radix,
                    reduction_factor=self.reduction_factor,
                    avg_down_stride=self.avg_down_stride,
                    dtype=self.dtype,
                    name=f'layer{si + 1}.{bi}')(x, train)
            if si + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if si in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
