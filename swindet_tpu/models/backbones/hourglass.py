"""HourglassNet backbone (reference: mmdet/models/backbones/
hourglass.py:79 — CornerNet/CentripetalNet; arXiv:1603.06937).

Recursive encoder-decoder of BasicBlock ResLayers with nearest-neighbour
upsampling; returns one feature per stack (2 for Hourglass-104). BN runs
frozen (use_running_average) matching this repo's backbone convention.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..builder import BACKBONES
from ..layers import ConvModule, resize_nearest
from .resnet import BasicBlock


class _ResLayer(nn.Module):
    """Stack of BasicBlocks (reference: models/utils/res_layer.py).
    ``downsample_first=False`` puts the channel/stride change on the
    LAST block (hourglass low3)."""
    out_channels: int
    num_blocks: int
    stride: int = 1
    downsample_first: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.num_blocks
        for i in range(n):
            changes = (i == 0) if self.downsample_first else (i == n - 1)
            stride = self.stride if changes else 1
            ds = changes and (stride != 1
                              or x.shape[-1] != self.out_channels)
            planes = (self.out_channels
                      if (self.downsample_first or i == n - 1)
                      else x.shape[-1])
            x = BasicBlock(planes, stride=stride, downsample=ds,
                           dtype=self.dtype, name=f'block{i}')(x, train)
        return x


class HourglassModule(nn.Module):
    """(reference: hourglass.py:9) one recursive hourglass level."""
    depth: int
    stage_channels: Tuple[int, ...]
    stage_blocks: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur_c, next_c = self.stage_channels[0], self.stage_channels[1]
        cur_b, next_b = self.stage_blocks[0], self.stage_blocks[1]
        up1 = _ResLayer(cur_c, cur_b, dtype=self.dtype, name='up1')(
            x, train)
        low1 = _ResLayer(next_c, cur_b, stride=2, dtype=self.dtype,
                         name='low1')(x, train)
        if self.depth > 1:
            low2 = HourglassModule(self.depth - 1,
                                   self.stage_channels[1:],
                                   self.stage_blocks[1:],
                                   dtype=self.dtype, name='low2')(
                low1, train)
        else:
            low2 = _ResLayer(next_c, next_b, dtype=self.dtype,
                             name='low2')(low1, train)
        low3 = _ResLayer(cur_c, cur_b, downsample_first=False,
                         dtype=self.dtype, name='low3')(low2, train)
        up2 = resize_nearest(low3, (up1.shape[1], up1.shape[2]))
        return up1 + up2


@BACKBONES.register_module()
class HourglassNet(nn.Module):
    """(reference: hourglass.py:79)."""
    downsample_times: int = 5
    num_stacks: int = 2
    stage_channels: Sequence[int] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Sequence[int] = (2, 2, 2, 2, 2, 4)
    feat_channel: int = 256
    norm_cfg: Any = None
    frozen_stages: int = -1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        sc = tuple(self.stage_channels)
        sb = tuple(self.stage_blocks)
        cur_c = sc[0]
        x = ConvModule(128, 7, stride=2, padding=3,
                       norm_cfg=dict(type='BN'),
                       act_cfg=dict(type='ReLU'), dtype=self.dtype,
                       name='stem0')(x, train)
        inter = _ResLayer(256, 1, stride=2, dtype=self.dtype,
                          name='stem1')(x, train)
        outs = []
        for i in range(self.num_stacks):
            hg = HourglassModule(self.downsample_times, sc, sb,
                                 dtype=self.dtype,
                                 name=f'hourglass{i}')(inter, train)
            out = ConvModule(self.feat_channel, 3, padding=1,
                             norm_cfg=dict(type='BN'),
                             act_cfg=dict(type='ReLU'),
                             dtype=self.dtype, name=f'out{i}')(hg, train)
            outs.append(out)
            if i < self.num_stacks - 1:
                a = ConvModule(cur_c, 1, norm_cfg=dict(type='BN'),
                               act_cfg=None, dtype=self.dtype,
                               name=f'conv1x1_{i}')(inter, train)
                b = ConvModule(cur_c, 1, norm_cfg=dict(type='BN'),
                               act_cfg=None, dtype=self.dtype,
                               name=f'remap{i}')(out, train)
                inter = _ResLayer(cur_c, 1, dtype=self.dtype,
                                  name=f'inter{i}')(
                    nn.relu(a + b), train)
        return tuple(outs)
