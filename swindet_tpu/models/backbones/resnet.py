"""ResNet / ResNeXt backbones (reference: mmdet/models/backbones/
resnet.py:663, resnext.py) — NHWC flax implementation.

Detection-style defaults mirror the reference: BN frozen in eval
semantics (``norm_eval=True`` → running stats always used; detection
fine-tuning never updates BN), ``frozen_stages`` gates gradient flow by
stop_gradient; style='caffe' puts the stage stride on conv1
(reference Bottleneck :185); deep_stem omitted.

Extras matching the reference backbone options:
- ``norm_cfg=dict(type='GN', num_groups=32)`` swaps every BN for
  GroupNorm (configs/gn, configs/scratch).
- ``conv_cfg=dict(type='ConvWS')`` weight-standardizes every conv
  (configs/gn+ws; mmcv ConvWS2d: w ← (w−μ)/σ per output filter).
- ``dcn=dict(type='DCN'|'DCNv2', deform_groups=g)`` +
  ``stage_with_dcn`` replaces bottleneck conv2 with (modulated)
  deformable conv (configs/dcn; reference resnet.py:117-131).
- ``plugins=[dict(cfg=..., stages=..., position='after_convN')]``
  injects ContextBlock / GeneralizedAttention after bottleneck convs
  (configs/gcnet, configs/empirical_attention; reference
  resnet.py:263 make_block_plugins).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..builder import BACKBONES
from ...ops.deform_conv import DeformConv2d
from ...ops.plugins import build_plugin
from ..layers import WSConv

Dtype = Any


def make_conv(conv_cfg, features, kernel_size, strides=1,
              padding='SAME', kernel_dilation=1, feature_group_count=1,
              dtype=jnp.float32, name=None):
    if conv_cfg is not None and conv_cfg.get('type') in ('ConvWS',
                                                         'ConvAWS'):
        return WSConv(features, tuple(kernel_size), strides=strides,
                      padding=padding, kernel_dilation=kernel_dilation,
                      feature_group_count=feature_group_count,
                      use_bias=False,
                      kernel_init=nn.initializers.he_normal(),
                      dtype=dtype, name=name)
    return nn.Conv(features, tuple(kernel_size), strides=strides,
                   padding=padding, kernel_dilation=kernel_dilation,
                   feature_group_count=feature_group_count,
                   use_bias=False, dtype=dtype, name=name)


def make_norm(norm_cfg, name):
    """GN when requested; otherwise detection-style frozen BN."""
    if norm_cfg is not None and norm_cfg.get('type') == 'GN':
        return nn.GroupNorm(num_groups=norm_cfg.get('num_groups', 32),
                            epsilon=norm_cfg.get('eps', 1e-5),
                            dtype=jnp.float32, name=name)
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    norm_cfg: Optional[dict] = None
    conv_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = make_conv(self.conv_cfg, self.planes, (3, 3),
                        strides=self.stride,
                        padding=[(self.dilation,) * 2] * 2,
                        kernel_dilation=self.dilation,
                        dtype=self.dtype, name='conv1')(x)
        out = make_norm(self.norm_cfg, 'bn1')(out)
        out = nn.relu(out).astype(self.dtype)
        out = make_conv(self.conv_cfg, self.planes, (3, 3),
                        padding=[(1, 1)] * 2, dtype=self.dtype,
                        name='conv2')(out)
        out = make_norm(self.norm_cfg, 'bn2')(out)
        if self.downsample:
            identity = make_conv(self.conv_cfg, self.planes, (1, 1),
                                 strides=self.stride, padding='VALID',
                                 dtype=self.dtype,
                                 name='downsample.0')(x)
            identity = make_norm(self.norm_cfg,
                                 'downsample.1')(identity)
        return nn.relu(out + identity).astype(self.dtype)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    style: str = 'pytorch'    # caffe: stride on conv1 (reference :185)
    dilation: int = 1
    groups: int = 1
    base_width: int = 64
    expansion: int = 4
    norm_cfg: Optional[dict] = None
    conv_cfg: Optional[dict] = None
    dcn: Optional[dict] = None
    plugins: Any = None          # tuple of (cfg, position) pairs
    dtype: Dtype = jnp.float32

    def _plugins_at(self, out, position):
        if not self.plugins:
            return out
        for i, (cfg, pos) in enumerate(self.plugins):
            if pos == position:
                out = build_plugin(dict(cfg), out.shape[-1],
                                   name=f'plugin{i}',
                                   dtype=self.dtype)(out)
        return out

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        conv1_stride = self.stride if self.style == 'caffe' else 1
        conv2_stride = 1 if self.style == 'caffe' else self.stride
        identity = x
        out = make_conv(self.conv_cfg, width, (1, 1), padding='VALID',
                        strides=conv1_stride,
                        dtype=self.dtype, name='conv1')(x)
        out = make_norm(self.norm_cfg, 'bn1')(out)
        out = nn.relu(out).astype(self.dtype)
        out = self._plugins_at(out, 'after_conv1')
        if self.dcn is not None:
            dg = self.dcn.get('deform_groups', 1)
            modulated = self.dcn.get('type') == 'DCNv2'
            k = 9
            off_ch = dg * (3 if modulated else 2) * k
            off = nn.Conv(off_ch, (3, 3), strides=conv2_stride,
                          padding=[(1, 1)] * 2, dtype=jnp.float32,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name='conv2.conv_offset')(out)
            dconv = DeformConv2d(width, (3, 3), stride=conv2_stride,
                                 deform_groups=dg, dtype=self.dtype,
                                 name='conv2')
            if modulated:
                b_, ho, wo, _ = off.shape
                off3 = off.reshape(b_, ho, wo, dg, 3, k)
                offset = off3[..., :2, :].transpose(
                    0, 1, 2, 3, 5, 4).reshape(b_, ho, wo, dg * 2 * k)
                mask = off3[..., 2, :].reshape(b_, ho, wo, dg * k)
                out = dconv(out, offset, mask)
            else:
                out = dconv(out, off)
        else:
            out = make_conv(self.conv_cfg, width, (3, 3),
                            strides=conv2_stride,
                            padding=[(self.dilation,) * 2] * 2,
                            kernel_dilation=self.dilation,
                            feature_group_count=self.groups,
                            dtype=self.dtype, name='conv2')(out)
        out = make_norm(self.norm_cfg, 'bn2')(out)
        out = nn.relu(out).astype(self.dtype)
        out = self._plugins_at(out, 'after_conv2')
        out = make_conv(self.conv_cfg, self.planes * self.expansion,
                        (1, 1), padding='VALID', dtype=self.dtype,
                        name='conv3')(out)
        out = make_norm(self.norm_cfg, 'bn3')(out)
        out = self._plugins_at(out, 'after_conv3')
        if self.downsample:
            identity = make_conv(self.conv_cfg,
                                 self.planes * self.expansion, (1, 1),
                                 strides=self.stride, padding='VALID',
                                 dtype=self.dtype,
                                 name='downsample.0')(x)
            identity = make_norm(self.norm_cfg,
                                 'downsample.1')(identity)
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
    style: str = 'pytorch'
    norm_cfg: Optional[dict] = None
    conv_cfg: Optional[dict] = None
    dcn: Optional[dict] = None
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    plugins: Optional[Sequence[dict]] = None
    norm_eval: bool = True
    zero_init_residual: bool = True
    dtype: Dtype = jnp.float32

    def _stage_plugins(self, stage_idx):
        """Select plugins active for this stage as (cfg, position)
        pairs (reference resnet.py:334 make_stage_plugins)."""
        if not self.plugins:
            return None
        out = []
        for p in self.plugins:
            stages = p.get('stages')
            if stages is None or stages[stage_idx]:
                out.append((p['cfg'], p.get('position', 'after_conv3')))
        return tuple(out) or None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        x = x.astype(self.dtype)
        x = make_conv(self.conv_cfg, self.base_channels, (7, 7),
                      strides=2, padding=[(3, 3)] * 2,
                      dtype=self.dtype, name='conv1')(x)
        x = make_norm(self.norm_cfg, 'bn1')(x)
        x = nn.relu(x).astype(self.dtype)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        planes = self.base_channels
        inplanes = self.base_channels
        expansion = 4 if block_cls is Bottleneck else 1
        for i, blocks in enumerate(stage_blocks[:self.num_stages]):
            stride = self.strides[i]
            dilation = self.dilations[i]
            for j in range(blocks):
                kwargs = {}
                if block_cls is Bottleneck:
                    kwargs = dict(
                        groups=self.groups, base_width=self.base_width,
                        style=self.style,
                        dcn=(self.dcn if self.stage_with_dcn[i]
                             else None),
                        plugins=self._stage_plugins(i))
                need_ds = (j == 0 and
                           (stride != 1 or
                            inplanes != planes * expansion))
                x = block_cls(planes=planes,
                              stride=stride if j == 0 else 1,
                              downsample=need_ds,
                              dilation=dilation,
                              norm_cfg=self.norm_cfg,
                              conv_cfg=self.conv_cfg,
                              dtype=self.dtype,
                              name=f'layer{i + 1}.{j}',
                              **kwargs)(x, train=train)
            if i + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
            inplanes = planes * expansion
            planes *= 2
        return tuple(outs)


@BACKBONES.register_module()
class ResNeXt(ResNet):
    """(reference: resnext.py) — grouped bottlenecks; e.g.
    ResNeXt-101 32x4d via groups=32, base_width=4."""
    groups: int = 32
    base_width: int = 4
