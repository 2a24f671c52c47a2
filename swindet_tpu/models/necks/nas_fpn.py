"""NAS-FPN neck (reference: mmdet/models/necks/nas_fpn.py:9 +
mmcv.ops.merge_cells, arXiv:1904.07392): the discovered 7-merge cell
topology repeated ``stack_times`` times over P3-P7.

Merge cells resize both operands to the output size (nearest upsample /
max-pool downsample), combine (sum, or global-pool attention), then an
act-conv-norm 3x3 (the mmcv ('act','conv','norm') order).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..builder import NECKS
from ..layers import build_norm, resize_nearest


def _resize_to(x, out_hw):
    h, w = x.shape[1:3]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    if h < oh:
        return resize_nearest(x, out_hw)
    k = h // oh
    return nn.max_pool(x, (k + 1, k + 1), strides=(k, k),
                       padding=[(k // 2, k // 2)] * 2)


class _MergeCell(nn.Module):
    out_channels: int
    mode: str = 'sum'          # 'sum' | 'gp'
    with_out_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, out_hw, train: bool = False):
        x1 = _resize_to(x1, out_hw)
        x2 = _resize_to(x2, out_hw)
        if self.mode == 'gp':
            att = jnp.mean(x2, axis=(1, 2), keepdims=True)
            x = x2 + x1 * nn.sigmoid(att.astype(jnp.float32)).astype(
                x1.dtype)
        else:
            x = x1 + x2
        if self.with_out_conv:
            x = nn.relu(x)
            x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                        use_bias=False, dtype=self.dtype,
                        name='out_conv')(x)
            x = build_norm(dict(type='BN'), name='out_norm')(
                x, train=train).astype(x.dtype)
        return x


@NECKS.register_module()
class NASFPN(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 7
    start_level: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        feats = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f'lateral_convs{i}')(
                        inputs[i + self.start_level])
            for i in range(len(self.in_channels) - self.start_level)]
        # extra downsamples to P6/P7 (1x1 conv + stride-2 maxpool)
        while len(feats) < self.num_outs:
            i = len(feats)
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name=f'extra_downsamples{i}')(feats[-1])
            x = jnp.pad(x, ((0, 0), (0, x.shape[1] % 2),
                            (0, x.shape[2] % 2), (0, 0)),
                        constant_values=-jnp.inf)
            feats.append(nn.max_pool(x, (2, 2), strides=(2, 2)))
        p3, p4, p5, p6, p7 = feats

        for s in range(self.stack_times):
            def cell(name, mode='sum', with_out=True):
                return _MergeCell(self.out_channels, mode=mode,
                                  with_out_conv=with_out,
                                  dtype=self.dtype,
                                  name=f'stage{s}_{name}')
            hw = lambda t: t.shape[1:3]
            # the discovered topology (reference nas_fpn.py:70-120)
            p4_1 = cell('gp_64_4', 'gp')(p6, p4, hw(p4), train=train)
            p4_2 = cell('sum_44_4')(p4_1, p4, hw(p4), train=train)
            p3 = cell('sum_43_3')(p4_2, p3, hw(p3), train=train)
            p4 = cell('sum_34_4')(p3, p4_2, hw(p4), train=train)
            p5_tmp = cell('gp_43_5', 'gp', with_out=False)(
                p4, p3, hw(p5), train=train)
            p5 = cell('sum_55_5')(p5, p5_tmp, hw(p5), train=train)
            p7_tmp = cell('gp_54_7', 'gp', with_out=False)(
                p5, p4_2, hw(p7), train=train)
            p7 = cell('sum_77_7')(p7, p7_tmp, hw(p7), train=train)
            p6 = cell('gp_75_6', 'gp')(p7, p5, hw(p6), train=train)
        return p3, p4, p5, p6, p7
