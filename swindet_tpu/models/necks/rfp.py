"""RFP — Recursive Feature Pyramid (reference: mmdet/models/necks/
rfp.py:59; arXiv:2006.02334). FPN whose outputs are fed back through a
second (unshared) backbone via ASPP-compressed per-stage features,
then fused with a zero-init sigmoid gate.

The backbone must be built with ``output_img=True`` so the neck
receives the raw image for the recursive pass (DetectoRS_ResNet)."""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import NECKS, build_backbone
from .fpn import FPN


class ASPP(nn.Module):
    """(reference: rfp.py:10)."""
    out_channels: int
    dilations: Sequence[int] = (1, 3, 6, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        gap = x.mean(axis=(1, 2), keepdims=True)
        n = len(self.dilations)
        for i, d in enumerate(self.dilations):
            inp = gap if i == n - 1 else x
            k = 3 if d > 1 else 1
            pad = d if d > 1 else 0
            o = nn.Conv(self.out_channels, (k, k),
                        padding=[(pad, pad)] * 2, kernel_dilation=d,
                        dtype=self.dtype, name=f'aspp{i}')(inp)
            outs.append(nn.relu(o))
        outs[-1] = jnp.broadcast_to(outs[-1], outs[-2].shape)
        return jnp.concatenate(outs, -1)


@NECKS.register_module()
class RFP(nn.Module):
    rfp_steps: int = 2
    rfp_backbone: Optional[dict] = None
    aspp_out_channels: int = 64
    aspp_dilations: Sequence[int] = (1, 3, 6, 1)
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: Any = False
    dtype: Any = jnp.float32

    def setup(self):
        self.fpn = FPN(in_channels=tuple(self.in_channels),
                       out_channels=self.out_channels,
                       num_outs=self.num_outs,
                       start_level=self.start_level,
                       add_extra_convs=self.add_extra_convs,
                       dtype=self.dtype, name='fpn')
        self.rfp_modules = [
            build_backbone(dict(self.rfp_backbone, dtype=self.dtype,
                                name=f'rfp_modules{i}'))
            for i in range(1, self.rfp_steps)]
        self.rfp_aspp = ASPP(self.aspp_out_channels,
                             tuple(self.aspp_dilations),
                             dtype=self.dtype, name='rfp_aspp')
        self.rfp_weight = nn.Conv(
            1, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name='rfp_weight')

    def __call__(self, inputs, train: bool = False):
        inputs = list(inputs)
        assert len(inputs) == len(self.in_channels) + 1, \
            'RFP needs the raw image first (backbone output_img=True)'
        img = inputs.pop(0)
        x = self.fpn(tuple(inputs), train=train)
        for rfp_idx in range(self.rfp_steps - 1):
            rfp_feats = [x[0]] + [self.rfp_aspp(x[i])
                                  for i in range(1, len(x))]
            feats = self.rfp_modules[rfp_idx].rfp_forward(
                img, rfp_feats, train=train)
            x_idx = self.fpn(tuple(feats), train=train)
            x_new = []
            for ft in range(len(x_idx)):
                w = jax.nn.sigmoid(
                    self.rfp_weight(x_idx[ft]).astype(jnp.float32)
                ).astype(x_idx[ft].dtype)
                x_new.append(w * x_idx[ft] + (1 - w) * x[ft])
            x = x_new
        return tuple(x)
