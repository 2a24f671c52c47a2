"""ChannelMapper neck (reference: mmdet/models/necks/
channel_mapper.py:10): per-level k x k ConvModules unifying channel
counts (used by DETR-style heads).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..builder import NECKS
from ..layers import ConvModule


@NECKS.register_module()
class ChannelMapper(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    kernel_size: int = 3
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        assert len(inputs) == len(self.in_channels)
        act = self.act_cfg if self.act_cfg is not None \
            else dict(type='ReLU')
        return tuple(
            ConvModule(self.out_channels, self.kernel_size,
                       padding=(self.kernel_size - 1) // 2,
                       norm_cfg=self.norm_cfg, act_cfg=act,
                       dtype=self.dtype, name=f'convs{i}')(
                           x, train=train)
            for i, x in enumerate(inputs))
