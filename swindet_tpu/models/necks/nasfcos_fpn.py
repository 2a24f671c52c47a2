"""NAS-FCOS searched FPN (reference: mmdet/models/necks/
nasfcos_fpn.py:10; arXiv:1906.04423).

Seven searched ConcatCells over the adapted C3-C5 features, a P3-P5
readout that fuses each chosen cell with cell f5 bilinearly, and
strided extra downsamples. Cell input convs honour
``conv_cfg=dict(type='DCNv2')`` (ModulatedDeformConvPack); cell output
convs are depthwise 1×1 in (norm, act, conv) order, matching the mmcv
ConcatCell the reference builds. BN runs in frozen (running-stats)
semantics like the rest of this framework's detection norms.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import NECKS
from ...ops.deform_conv import ModulatedDeformConvPack


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


def _resize_to(x, hw):
    """mmcv BaseMergeCell._resize: nearest up, max-pool down."""
    h, w = x.shape[1:3]
    th, tw = hw
    if (h, w) == (th, tw):
        return x
    if h < th:
        return jax.image.resize(x, (x.shape[0], th, tw, x.shape[3]),
                                'nearest')
    k = h // th
    return nn.max_pool(x, (k, k), strides=(k, k))


class ConcatCell(nn.Module):
    """(mmcv.ops.merge_cells.ConcatCell)."""
    out_channels: int
    with_input1_conv: bool = False
    with_input2_conv: bool = False
    input_conv_cfg: Optional[dict] = None
    input_norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def _input_conv(self, x, name):
        if self.input_conv_cfg is not None and \
                self.input_conv_cfg.get('type') == 'DCNv2':
            x = ModulatedDeformConvPack(
                self.out_channels, 3,
                deform_groups=self.input_conv_cfg.get('deform_groups',
                                                      1),
                use_bias=True, dtype=self.dtype, name=f'{name}.conv')(x)
        else:
            x = nn.Conv(self.out_channels, (3, 3),
                        padding=[(1, 1)] * 2, dtype=self.dtype,
                        name=f'{name}.conv')(x)
        if self.input_norm_cfg is not None:
            x = _bn(f'{name}.bn')(x).astype(self.dtype)
        return x

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        if self.with_input1_conv:
            x1 = self._input_conv(x1, 'input1_conv')
        if self.with_input2_conv:
            x2 = self._input_conv(x2, 'input2_conv')
        th = max(x1.shape[1], x2.shape[1])
        tw = max(x1.shape[2], x2.shape[2])
        x1 = _resize_to(x1, (th, tw))
        x2 = _resize_to(x2, (th, tw))
        x = jnp.concatenate([x1, x2], axis=-1)
        # out conv order ('norm', 'act', 'conv'), depthwise 1x1
        x = _bn('out_norm')(x).astype(self.dtype)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    feature_group_count=self.out_channels,
                    dtype=self.dtype, name='out_conv')(x)
        return x


@NECKS.register_module()
class NASFCOS_FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 1
    end_level: int = -1
    add_extra_convs: Any = False
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    # searched wiring: cell name 'cXY' consumes feats[X], feats[Y]
    CELLS = (('c22_1', True, True), ('c22_2', True, True),
             ('c32', True, False), ('c02', True, False),
             ('c42', True, True), ('c36', True, True),
             ('c61', True, True))

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        feats = []
        for i in range(self.start_level, len(self.in_channels)):
            x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype,
                        name=f'adapt_convs{i - self.start_level}.conv')(
                            inputs[i])
            x = _bn(f'adapt_convs{i - self.start_level}.bn')(x)
            feats.append(nn.relu(x).astype(self.dtype))

        for name, in1, in2 in self.CELLS:
            i1, i2 = int(name[1]), int(name[2])
            feats.append(ConcatCell(
                self.out_channels, with_input1_conv=in1,
                with_input2_conv=in2, input_conv_cfg=self.conv_cfg,
                input_norm_cfg=self.norm_cfg, dtype=self.dtype,
                name=f'fpn.{name}')(feats[i1], feats[i2], train=train))

        ret = []
        for idx, input_idx in zip([9, 8, 7], [1, 2, 3]):
            f1, f2 = feats[idx], feats[5]
            b, h, w, c = f1.shape
            f2r = jax.image.resize(f2, (b, h, w, c), 'bilinear')
            s = f1 + f2r
            oh, ow = inputs[input_idx].shape[1:3]
            ret.append(jax.image.resize(
                s.astype(jnp.float32), (b, oh, ow, c),
                'bilinear').astype(self.dtype))

        x = ret[-1]
        extra = self.num_outs - len(ret)
        for i in range(extra):
            if i > 0:
                x = nn.relu(x)
            x = nn.Conv(self.out_channels, (3, 3), strides=2,
                        padding=[(1, 1)] * 2, dtype=self.dtype,
                        name=f'extra_downsamples{i}')(x)
            ret.append(x)
        return tuple(ret)
