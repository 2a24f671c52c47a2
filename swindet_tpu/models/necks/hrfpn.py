"""HRFPN neck (reference: mmdet/models/necks/hrfpn.py:11): upsample
all HRNet branches to the highest resolution, concat, 1x1 reduce,
then avg/max-pool into a pyramid of ``num_outs`` levels with per-level
3x3 convs.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import NECKS


def _resize_bilinear(x, shape):
    return jax.image.resize(
        x, (x.shape[0],) + tuple(shape) + (x.shape[-1],),
        method='bilinear')


@NECKS.register_module()
class HRFPN(nn.Module):
    in_channels: Sequence[int] = (32, 64, 128, 256)
    out_channels: int = 256
    num_outs: int = 5
    pooling_type: str = 'AVG'
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        assert len(inputs) == len(self.in_channels)
        h, w = inputs[0].shape[1:3]
        outs = [inputs[0]]
        for i in range(1, len(inputs)):
            outs.append(_resize_bilinear(inputs[i], (h, w)))
        out = jnp.concatenate(outs, axis=-1)
        out = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                      name='reduction_conv')(out)
        pool = nn.max_pool if self.pooling_type == 'MAX' else nn.avg_pool
        outs = [out]
        for i in range(1, self.num_outs):
            k = 2 ** i
            outs.append(pool(out, (k, k), strides=(k, k)))
        return tuple(
            nn.Conv(self.out_channels, (3, 3), strides=self.stride,
                    padding=[(1, 1)] * 2, dtype=self.dtype,
                    name=f'fpn_convs{i}')(o)
            for i, o in enumerate(outs))
