"""FPN neck (reference: mmdet/models/necks/fpn.py:12).

NHWC; lateral 1×1 convs + top-down nearest-upsample adds + 3×3 output
convs; extra levels via stride-2 convs (``add_extra_convs``) or 1×1/s2
max-pool subsampling (the reference's default for num_outs > backbone
levels). Upsampling uses exact nearest semantics so converted torch
weights are numerically comparable.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax.numpy as jnp
import flax.linen as nn

from ..builder import NECKS
from ..layers import ConvModule, max_pool_1x1_s2, resize_nearest


@NECKS.register_module()
class FPN(nn.Module):
    in_channels: Sequence[int] = (96, 192, 384, 768)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: Union[bool, str] = False
    relu_before_extra_convs: bool = False
    no_norm_on_lateral: bool = False
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    upsample_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        num_ins = len(self.in_channels)
        end_level = num_ins - 1 if self.end_level in (-1, num_ins - 1) \
            else self.end_level
        used_backbone_levels = end_level - self.start_level + 1

        add_extra = self.add_extra_convs
        if add_extra is True:
            add_extra = 'on_input'

        # lateral 1x1
        laterals = []
        for i in range(self.start_level, end_level + 1):
            lat = ConvModule(
                self.out_channels, kernel_size=1,
                conv_cfg=self.conv_cfg,
                norm_cfg=None if self.no_norm_on_lateral else self.norm_cfg,
                act_cfg=self.act_cfg, dtype=self.dtype,
                name=f'lateral_convs{i - self.start_level}')(
                    inputs[i], train=train)
            laterals.append(lat)

        # top-down pathway (mode from upsample_cfg — YOLACT's FPN uses
        # bilinear, reference fpn.py:186 F.interpolate align_corners=False
        # == jax.image.resize 'bilinear' half-pixel centers on upscale)
        mode = (self.upsample_cfg or {}).get('mode', 'nearest')
        for i in range(used_backbone_levels - 1, 0, -1):
            prev_shape = laterals[i - 1].shape[1:3]
            if mode == 'nearest':
                up = resize_nearest(laterals[i], prev_shape)
            else:
                import jax
                b, _, _, c = laterals[i].shape
                up = jax.image.resize(
                    laterals[i].astype(jnp.float32),
                    (b, prev_shape[0], prev_shape[1], c),
                    mode).astype(laterals[i].dtype)
            laterals[i - 1] = laterals[i - 1] + up

        # output 3x3 convs
        outs = []
        for i in range(used_backbone_levels):
            outs.append(ConvModule(
                self.out_channels, kernel_size=3, padding=1,
                conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                act_cfg=self.act_cfg,
                dtype=self.dtype, name=f'fpn_convs{i}')(
                    laterals[i], train=train))

        # extra levels
        if self.num_outs > len(outs):
            if not add_extra:
                for _ in range(self.num_outs - used_backbone_levels):
                    outs.append(max_pool_1x1_s2(outs[-1]))
            else:
                if add_extra == 'on_input':
                    extra_src = inputs[end_level]
                elif add_extra == 'on_lateral':
                    extra_src = laterals[-1]
                else:  # 'on_output'
                    extra_src = outs[-1]
                for i in range(used_backbone_levels,
                               self.num_outs):
                    if i > used_backbone_levels and \
                            self.relu_before_extra_convs:
                        extra_src = nn.relu(extra_src)
                    extra_src = ConvModule(
                        self.out_channels, kernel_size=3, stride=2,
                        padding=1, conv_cfg=self.conv_cfg,
                        norm_cfg=self.norm_cfg,
                        act_cfg=self.act_cfg, dtype=self.dtype,
                        name=f'fpn_convs{i}')(extra_src, train=train)
                    outs.append(extra_src)
        # Layout fence: downstream Pallas custom calls (RoIAlign) force
        # row-major operand layouts; without the barrier XLA propagates
        # that constraint into the FPN/RPN convs, which then run in a
        # transposed layout at ~5x the time. The barrier decouples the
        # conv layouts and inserts one cheap copy instead.
        import jax
        outs = jax.lax.optimization_barrier(tuple(outs))
        return tuple(outs)
