"""HRNet backbone (reference: mmdet/models/backbones/hrnet.py:187 —
parallel multi-resolution branches with repeated cross-resolution
fusion) + compatible with HRFPN (necks/hrfpn.py).

NHWC flax. Config shape mirrors the reference ``extra`` dict:
stage{1..4} with num_modules/num_branches/block/num_blocks/
num_channels.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import BACKBONES
from ..layers import resize_nearest
from .resnet import BasicBlock, Bottleneck

Dtype = Any


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


class HRModule(nn.Module):
    """One multi-branch module: per-branch blocks + full cross fuse
    (reference: HRModule:22)."""
    num_branches: int
    block: str                      # 'BASIC' | 'BOTTLENECK'
    num_blocks: Sequence[int]
    in_channels: Sequence[int]      # per-branch channels (post-expansion)
    multiscale_output: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        block_cls = BasicBlock if self.block == 'BASIC' else Bottleneck
        outs = []
        for b in range(self.num_branches):
            x = xs[b]
            planes = self.in_channels[b] // (
                1 if self.block == 'BASIC' else 4)
            for k in range(self.num_blocks[b]):
                x = block_cls(planes=planes, stride=1, downsample=False,
                              dtype=self.dtype,
                              name=f'branches{b}.{k}')(x, train=train)
            outs.append(x)
        if self.num_branches == 1:
            return outs

        n_out = self.num_branches if self.multiscale_output else 1
        fused = []
        for i in range(n_out):
            y = None
            for j in range(self.num_branches):
                if j == i:
                    t = outs[j]
                elif j > i:
                    # 1x1 conv + BN + nearest 2^(j-i) upsample
                    t = nn.Conv(self.in_channels[i], (1, 1),
                                use_bias=False, dtype=self.dtype,
                                name=f'fuse{i}.{j}.conv')(outs[j])
                    t = _bn(f'fuse{i}.{j}.bn')(t).astype(self.dtype)
                    t = resize_nearest(
                        t, (t.shape[1] * 2 ** (j - i),
                            t.shape[2] * 2 ** (j - i)))
                else:
                    # chain of 3x3/s2 convs
                    t = outs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.in_channels[i] if last \
                            else self.in_channels[j]
                        t = nn.Conv(ch, (3, 3), strides=2,
                                    padding=[(1, 1)] * 2, use_bias=False,
                                    dtype=self.dtype,
                                    name=f'fuse{i}.{j}.down{k}.conv')(t)
                        t = _bn(f'fuse{i}.{j}.down{k}.bn')(t).astype(
                            self.dtype)
                        if not last:
                            t = nn.relu(t)
                y = t if y is None else y + t
            fused.append(nn.relu(y).astype(self.dtype))
        return fused


@BACKBONES.register_module()
class HRNet(nn.Module):
    extra: Dict[str, Any] = None
    in_channels: int = 3
    frozen_stages: int = -1
    norm_eval: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        extra = self.extra
        x = x.astype(self.dtype)
        for i in (1, 2):
            x = nn.Conv(64, (3, 3), strides=2, padding=[(1, 1)] * 2,
                        use_bias=False, dtype=self.dtype,
                        name=f'conv{i}')(x)
            x = nn.relu(_bn(f'bn{i}')(x)).astype(self.dtype)

        # stage 1 (single branch of Bottlenecks)
        s1 = extra['stage1']
        block1 = BasicBlock if s1['block'] == 'BASIC' else Bottleneck
        exp1 = 1 if s1['block'] == 'BASIC' else 4
        planes = s1['num_channels'][0]
        for k in range(s1['num_blocks'][0]):
            x = block1(planes=planes, stride=1, downsample=(k == 0),
                       dtype=self.dtype,
                       name=f'layer1.{k}')(x, train=train)
        pre_channels = [planes * exp1]

        xs = [x]
        for si in (2, 3, 4):
            cfg = extra[f'stage{si}']
            exp = 1 if cfg['block'] == 'BASIC' else 4
            cur_channels = [c * exp for c in cfg['num_channels']]
            nb = cfg['num_branches']
            # transition (reference _make_transition_layer:357)
            new_xs = []
            for i in range(nb):
                if i < len(pre_channels):
                    if cur_channels[i] != pre_channels[i]:
                        t = nn.Conv(cur_channels[i], (3, 3),
                                    padding=[(1, 1)] * 2, use_bias=False,
                                    dtype=self.dtype,
                                    name=f'transition{si - 1}.{i}.conv'
                                    )(xs[i])
                        t = nn.relu(_bn(
                            f'transition{si - 1}.{i}.bn')(t)).astype(
                                self.dtype)
                        new_xs.append(t)
                    else:
                        new_xs.append(xs[i])
                else:
                    t = nn.Conv(cur_channels[i], (3, 3), strides=2,
                                padding=[(1, 1)] * 2, use_bias=False,
                                dtype=self.dtype,
                                name=f'transition{si - 1}.{i}.conv'
                                )(xs[-1])
                    t = nn.relu(_bn(
                        f'transition{si - 1}.{i}.bn')(t)).astype(
                            self.dtype)
                    new_xs.append(t)
            xs = new_xs
            for m in range(cfg['num_modules']):
                last_module = m == cfg['num_modules'] - 1
                xs = HRModule(
                    num_branches=nb, block=cfg['block'],
                    num_blocks=cfg['num_blocks'],
                    in_channels=cur_channels,
                    multiscale_output=(True if si < 4 or last_module
                                       else True),
                    dtype=self.dtype,
                    name=f'stage{si}.{m}')(xs, train=train)
            pre_channels = cur_channels
        return tuple(xs)
