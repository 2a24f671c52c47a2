"""NAS-FCOS head (reference: mmdet/models/dense_heads/
nasfcos_head.py:11; arXiv:1906.04423).

FCOS with the searched tower — dconv3×3(dg=2, bias), conv3×3,
dconv3×3, conv1×1 — each followed by GN, replacing the plain stacked
convs. Loss/targets/decode are inherited from FCOSHead unchanged.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS
from .fcos_head import FCOSHead
from ...ops.deform_conv import ModulatedDeformConvPack


class _NASTowerOp(nn.Module):
    """One searched op + GN + ReLU."""
    feat_channels: int
    op: str                      # 'dconv3', 'conv3', 'conv1'
    num_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.op == 'dconv3':
            x = ModulatedDeformConvPack(self.feat_channels, 3,
                                        deform_groups=2, use_bias=True,
                                        dtype=self.dtype,
                                        name='conv')(x)
        elif self.op == 'conv3':
            x = nn.Conv(self.feat_channels, (3, 3),
                        padding=[(1, 1)] * 2, use_bias=False,
                        dtype=self.dtype, name='conv')(x)
        else:
            x = nn.Conv(self.feat_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name='conv')(x)
        x = nn.GroupNorm(num_groups=self.num_groups,
                         dtype=jnp.float32, name='gn')(x)
        return nn.relu(x).astype(self.dtype)


@HEADS.register_module()
class NASFCOSHead(FCOSHead):
    """FCOSHead with the searched classification/regression towers."""

    ARCH = ('dconv3', 'conv3', 'dconv3', 'conv1')

    def _build_towers(self):
        ng = (self.norm_cfg or {}).get('num_groups', 32)
        cls_convs = [
            _NASTowerOp(self.feat_channels, op, num_groups=ng,
                        dtype=self.dtype, name=f'cls_convs{i}')
            for i, op in enumerate(self.ARCH)]
        reg_convs = [
            _NASTowerOp(self.feat_channels, op, num_groups=ng,
                        dtype=self.dtype, name=f'reg_convs{i}')
            for i, op in enumerate(self.ARCH)]
        return cls_convs, reg_convs
