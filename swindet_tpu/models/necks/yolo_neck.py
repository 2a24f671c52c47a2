"""YOLOV3 neck (reference: mmdet/models/necks/yolo_neck.py:60):
top-down detection blocks with 2x nearest upsample + concat.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..builder import NECKS
from ..layers import ConvModule, resize_nearest

_ACT = dict(type='LeakyReLU', negative_slope=0.1)
_BN = dict(type='BN', requires_grad=True)


class DetectionBlock(nn.Module):
    """Five alternating 1x1/3x3 convs (reference :11)."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.out_channels
        kw = dict(norm_cfg=_BN, act_cfg=_ACT, dtype=self.dtype)
        x = ConvModule(oc, 1, name='conv1', **kw)(x, train=train)
        x = ConvModule(oc * 2, 3, padding=1, name='conv2', **kw)(
            x, train=train)
        x = ConvModule(oc, 1, name='conv3', **kw)(x, train=train)
        x = ConvModule(oc * 2, 3, padding=1, name='conv4', **kw)(
            x, train=train)
        x = ConvModule(oc, 1, name='conv5', **kw)(x, train=train)
        return x


@NECKS.register_module()
class YOLOV3Neck(nn.Module):
    num_scales: int = 3
    in_channels: Sequence[int] = (1024, 512, 256)
    out_channels: Sequence[int] = (512, 256, 128)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        assert len(feats) == self.num_scales
        kw = dict(norm_cfg=_BN, act_cfg=_ACT, dtype=self.dtype)
        outs = []
        out = DetectionBlock(self.out_channels[0], dtype=self.dtype,
                             name='detect1')(feats[-1], train=train)
        outs.append(out)
        for i, x in enumerate(reversed(feats[:-1])):
            tmp = ConvModule(self.out_channels[i + 1], 1,
                             name=f'conv{i + 1}', **kw)(out, train=train)
            tmp = resize_nearest(tmp, (tmp.shape[1] * 2, tmp.shape[2] * 2))
            tmp = jnp.concatenate([tmp, x], axis=-1)
            out = DetectionBlock(self.out_channels[i + 1],
                                 dtype=self.dtype,
                                 name=f'detect{i + 2}')(tmp, train=train)
            outs.append(out)
        return tuple(outs)
