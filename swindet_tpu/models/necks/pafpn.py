"""PAFPN (reference: mmdet/models/necks/pafpn.py) — FPN + bottom-up
path aggregation (PANet)."""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..builder import NECKS
from ..layers import ConvModule, resize_nearest
from .fpn import FPN


@NECKS.register_module()
class PAFPN(FPN):

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        num_ins = len(inputs)
        end_level = num_ins - 1 if self.end_level in (-1, num_ins - 1) \
            else self.end_level
        used = end_level - self.start_level + 1

        laterals = []
        for i in range(self.start_level, end_level + 1):
            laterals.append(ConvModule(
                self.out_channels, kernel_size=1,
                norm_cfg=None if self.no_norm_on_lateral else self.norm_cfg,
                act_cfg=self.act_cfg, dtype=self.dtype,
                name=f'lateral_convs{i - self.start_level}')(
                    inputs[i], train=train))

        # top-down
        for i in range(used - 1, 0, -1):
            prev_shape = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + resize_nearest(
                laterals[i], prev_shape)

        # inter-level 3x3 (fpn convs)
        inter = [ConvModule(self.out_channels, kernel_size=3, padding=1,
                            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                            dtype=self.dtype, name=f'fpn_convs{i}')(
                                laterals[i], train=train)
                 for i in range(used)]

        # bottom-up path (PANet): stride-2 downsample conv + add
        outs = [inter[0]]
        for i in range(used - 1):
            down = ConvModule(self.out_channels, kernel_size=3, stride=2,
                              padding=1, norm_cfg=self.norm_cfg,
                              act_cfg=self.act_cfg, dtype=self.dtype,
                              name=f'downsample_convs{i}')(
                                  outs[-1], train=train)
            outs.append(down + inter[i + 1])
        # output convs on the aggregated levels
        outs = [outs[0]] + [
            ConvModule(self.out_channels, kernel_size=3, padding=1,
                       norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                       dtype=self.dtype, name=f'pafpn_convs{i - 1}')(
                           outs[i], train=train)
            for i in range(1, used)]

        if self.num_outs > len(outs):
            add_extra = self.add_extra_convs
            if add_extra is True:
                add_extra = 'on_input'
            if not add_extra:
                from ..layers import max_pool_1x1_s2
                for _ in range(self.num_outs - used):
                    outs.append(max_pool_1x1_s2(outs[-1]))
            else:
                if add_extra == 'on_input':
                    extra_src = inputs[end_level]
                else:
                    extra_src = outs[-1]
                for i in range(used, self.num_outs):
                    if i > used and self.relu_before_extra_convs:
                        extra_src = nn.relu(extra_src)
                    extra_src = ConvModule(
                        self.out_channels, kernel_size=3, stride=2,
                        padding=1, norm_cfg=self.norm_cfg,
                        act_cfg=self.act_cfg, dtype=self.dtype,
                        name=f'fpn_convs{i}')(extra_src, train=train)
                    outs.append(extra_src)
        return tuple(outs)
