"""RegNetX backbone (reference: mmdet/models/backbones/regnet.py:11 —
widths from the quantized linear parameterization w = w0 + wa*i
snapped to powers of wm, grouped bottleneck blocks, 3x3/s2 stem).

NHWC flax; detection conventions as resnet.py.
"""
from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import BACKBONES

Dtype = Any

ARCH_SETTINGS = {
    'regnetx_400mf':
    dict(w0=24, wa=24.48, wm=2.54, group_w=16, depth=22, bot_mul=1.0),
    'regnetx_800mf':
    dict(w0=56, wa=35.73, wm=2.28, group_w=16, depth=16, bot_mul=1.0),
    'regnetx_1.6gf':
    dict(w0=80, wa=34.01, wm=2.25, group_w=24, depth=18, bot_mul=1.0),
    'regnetx_3.2gf':
    dict(w0=88, wa=26.31, wm=2.25, group_w=48, depth=25, bot_mul=1.0),
    'regnetx_4.0gf':
    dict(w0=96, wa=38.65, wm=2.43, group_w=40, depth=23, bot_mul=1.0),
    'regnetx_6.4gf':
    dict(w0=184, wa=60.83, wm=2.07, group_w=56, depth=17, bot_mul=1.0),
    'regnetx_8.0gf':
    dict(w0=80, wa=49.56, wm=2.88, group_w=120, depth=23, bot_mul=1.0),
    'regnetx_12gf':
    dict(w0=168, wa=73.36, wm=2.37, group_w=112, depth=19, bot_mul=1.0),
}


def generate_regnet(w0, wa, wm, depth, divisor=8):
    """(reference :221)."""
    widths_cont = np.arange(depth) * wa + w0
    ks = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, ks)
    widths = (np.round(widths / divisor) * divisor).astype(int).tolist()
    return widths, len(set(widths))


def _quantize(n, divisor):
    return int(round(n / divisor) * divisor)


def adjust_width_group(widths, bot_muls, groups):
    """(reference :266)."""
    bw = [int(w * b) for w, b in zip(widths, bot_muls)]
    groups = [min(g, w) for g, w in zip(groups, bw)]
    bw = [_quantize(w, g) for w, g in zip(bw, groups)]
    widths = [int(w / b) for w, b in zip(bw, bot_muls)]
    return widths, groups


def stages_from_blocks(widths):
    """(reference :291)."""
    diff = [w != wp for w, wp in zip(widths + [0], [0] + widths)]
    stage_widths = [w for w, d in zip(widths, diff[:-1]) if d]
    stage_blocks = np.diff(
        [i for i, d in enumerate(diff) if d]).tolist()
    return stage_widths, stage_blocks


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


class RegBottleneck(nn.Module):
    width: int
    stride: int = 1
    downsample: bool = False
    group_width: int = 8
    bot_mul: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bw = int(round(self.width * self.bot_mul))
        groups = bw // self.group_width
        identity = x
        out = nn.Conv(bw, (1, 1), use_bias=False, dtype=self.dtype,
                      name='conv1')(x)
        out = nn.relu(_bn('bn1')(out)).astype(self.dtype)
        out = nn.Conv(bw, (3, 3), strides=self.stride,
                      padding=[(1, 1)] * 2,
                      feature_group_count=max(groups, 1),
                      use_bias=False, dtype=self.dtype, name='conv2')(out)
        out = nn.relu(_bn('bn2')(out)).astype(self.dtype)
        out = nn.Conv(self.width, (1, 1), use_bias=False,
                      dtype=self.dtype, name='conv3')(out)
        out = _bn('bn3')(out)
        if self.downsample:
            identity = nn.Conv(self.width, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name='downsample.0')(x)
            identity = _bn('downsample.1')(identity)
        return nn.relu(out + identity).astype(self.dtype)


@BACKBONES.register_module()
class RegNet(nn.Module):
    arch: Any = 'regnetx_3.2gf'
    stem_channels: int = 32
    strides: Sequence[int] = (2, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    norm_eval: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        arch = (ARCH_SETTINGS[self.arch]
                if isinstance(self.arch, str) else dict(self.arch))
        widths, num_stages = generate_regnet(
            arch['w0'], arch['wa'], arch['wm'], arch['depth'])
        stage_widths, stage_blocks = stages_from_blocks(widths)
        bot_muls = [arch['bot_mul']] * num_stages
        group_ws = [arch['group_w']] * num_stages
        stage_widths, group_ws = adjust_width_group(
            stage_widths, bot_muls, group_ws)

        x = x.astype(self.dtype)
        x = nn.Conv(self.stem_channels, (3, 3), strides=2,
                    padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name='conv1')(x)
        x = nn.relu(_bn('bn1')(x)).astype(self.dtype)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        for si in range(num_stages):
            for bi in range(stage_blocks[si]):
                first = bi == 0
                x = RegBottleneck(
                    width=stage_widths[si],
                    stride=self.strides[si] if first else 1,
                    downsample=first,
                    group_width=group_ws[si], bot_mul=bot_muls[si],
                    dtype=self.dtype,
                    name=f'layer{si + 1}.{bi}')(x, train=train)
            if si + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if si in self.out_indices:
                outs.append(x)
        return tuple(outs)
