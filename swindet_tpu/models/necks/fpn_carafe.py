"""FPN_CARAFE (reference: mmdet/models/necks/fpn_carafe.py:8) — FPN
whose top-down upsampling is the content-aware CARAFE operator
(ops/carafe.py); extra levels come from stride-2 convs with their own
laterals + upsamplers, exactly mirroring the reference's layout."""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import NECKS
from ..layers import ConvModule, resize_nearest, xavier_init
from ...ops.carafe import CARAFEPack


@NECKS.register_module()
class FPN_CARAFE(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    upsample_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        assert self.end_level == -1
        up = dict(self.upsample_cfg or dict(
            type='carafe', up_kernel=5, up_group=1, encoder_kernel=3,
            encoder_dilation=1))
        self.upsample = up.pop('type')
        self._up_cfg = up
        n_in = len(self.in_channels)
        self.backbone_end_level = n_in
        extra_levels = self.num_outs - n_in + self.start_level

        laterals, fpns, ups = [], [], []
        for i in range(self.start_level, n_in):
            laterals.append(ConvModule(
                self.out_channels, 1, norm_cfg=self.norm_cfg,
                act_cfg=self.act_cfg, dtype=self.dtype,
                kernel_init=xavier_init(), name=f'lateral_convs{i}'))
            fpns.append(ConvModule(
                self.out_channels, 3, padding=1, norm_cfg=self.norm_cfg,
                act_cfg=self.act_cfg, dtype=self.dtype,
                kernel_init=xavier_init(), name=f'fpn_convs{i}'))
            if i != n_in - 1 and self.upsample == 'carafe':
                ups.append(CARAFEPack(
                    channels=self.out_channels, scale_factor=2,
                    up_kernel=self._up_cfg.get('up_kernel', 5),
                    up_group=self._up_cfg.get('up_group', 1),
                    encoder_kernel=self._up_cfg.get('encoder_kernel', 3),
                    encoder_dilation=self._up_cfg.get(
                        'encoder_dilation', 1),
                    dtype=self.dtype, name=f'upsample_modules{i}'))
        for j in range(max(extra_levels, 0)):
            laterals.append(ConvModule(
                self.out_channels, 3, stride=2, padding=1,
                norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                dtype=self.dtype, kernel_init=xavier_init(),
                name=f'extra_lateral{j}'))
            fpns.append(ConvModule(
                self.out_channels, 3, padding=1, norm_cfg=self.norm_cfg,
                act_cfg=self.act_cfg, dtype=self.dtype,
                kernel_init=xavier_init(), name=f'extra_fpn{j}'))
        self.lateral_convs = laterals
        self.fpn_convs = fpns
        self.upsample_modules = ups

    def __call__(self, inputs, train: bool = False):
        laterals = []
        n_bb = self.backbone_end_level - self.start_level
        for i, conv in enumerate(self.lateral_convs):
            if i < n_bb:
                src = inputs[i + self.start_level]
            elif i == n_bb:
                src = inputs[-1]
            else:
                src = laterals[-1]
            laterals.append(conv(src, train=train))
        for i in range(n_bb - 1, 0, -1):
            if self.upsample == 'carafe':
                upf = self.upsample_modules[i - 1](laterals[i])
            else:
                h, w = laterals[i - 1].shape[1:3]
                upf = resize_nearest(laterals[i], (h, w))
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + upf[:, :h, :w]
        return tuple(conv(lat, train=train)
                     for conv, lat in zip(self.fpn_convs, laterals))
