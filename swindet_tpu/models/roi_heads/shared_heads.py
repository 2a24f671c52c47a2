"""Shared RoI heads (reference: mmdet/models/roi_heads/shared_heads/
res_layer.py:12).

C4-style detectors (Faster R-CNN C4, TridentNet) extract 14×14 RoI
features from the stride-16 C4 map and run them through ResNet's
stage-4 (layer4) bottlenecks — shared between the bbox and mask
branches — before the box head's average pool.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from ..builder import SHARED_HEADS
from ..backbones.resnet import ARCH_SETTINGS, Bottleneck


@SHARED_HEADS.register_module()
class ResLayer(nn.Module):
    depth: int = 50
    stage: int = 3
    stride: int = 2
    dilation: int = 1
    style: str = 'pytorch'
    norm_cfg: Optional[dict] = None
    norm_eval: bool = True
    base_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        assert block_cls is Bottleneck, 'ResLayer supports R50/R101/R152'
        blocks = stage_blocks[self.stage]
        planes = self.base_channels * 2 ** self.stage
        expansion = 4
        inplanes = x.shape[-1]
        for j in range(blocks):
            need_ds = (j == 0 and
                       (self.stride != 1 or
                        inplanes != planes * expansion))
            x = Bottleneck(planes=planes,
                           stride=self.stride if j == 0 else 1,
                           downsample=need_ds,
                           dilation=self.dilation,
                           norm_cfg=self.norm_cfg,
                           dtype=self.dtype,
                           name=f'layer{self.stage + 1}.{j}')(
                               x, train=train)
            inplanes = planes * expansion
        return x
