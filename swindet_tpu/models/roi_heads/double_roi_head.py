"""Double-Head R-CNN (reference: mmdet/models/roi_heads/
double_roi_head.py:6 + bbox_heads/double_bbox_head.py:72,
arXiv:1904.06493): classification through an fc branch on normal RoI
features, regression through a conv (residual bottleneck) branch on
enlarged RoIs.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS
from ..layers import ConvModule
from .bbox_heads import ConvFCBBoxHead
from .standard_roi_head import StandardRoIHead

_BN = dict(type='BN')


class _BasicResBlock(nn.Module):
    """(reference: double_bbox_head.py:9)."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvModule(x.shape[-1], 3, padding=1, norm_cfg=_BN,
                         act_cfg=dict(type='ReLU'), dtype=self.dtype,
                         name='conv1')(x, train=train)
        out = ConvModule(self.out_channels, 1, norm_cfg=_BN,
                         act_cfg=None, dtype=self.dtype,
                         name='conv2')(out, train=train)
        identity = ConvModule(self.out_channels, 1, norm_cfg=_BN,
                              act_cfg=None, dtype=self.dtype,
                              name='conv_identity')(identity, train=train)
        return nn.relu(out + identity)


class _Bottleneck(nn.Module):
    planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvModule(self.planes, 1, norm_cfg=_BN,
                         act_cfg=dict(type='ReLU'), dtype=self.dtype,
                         name='conv1')(x, train=train)
        out = ConvModule(self.planes, 3, padding=1, norm_cfg=_BN,
                         act_cfg=dict(type='ReLU'), dtype=self.dtype,
                         name='conv2')(out, train=train)
        out = ConvModule(x.shape[-1], 1, norm_cfg=_BN, act_cfg=None,
                         dtype=self.dtype, name='conv3')(out, train=train)
        return nn.relu(out + identity)


@HEADS.register_module()
class DoubleConvFCBBoxHead(ConvFCBBoxHead):
    """cls <- fc branch on x_cls; reg <- res-block + bottleneck convs +
    avgpool on x_reg (reference: double_bbox_head.py:152)."""
    num_convs: int = 4
    num_fcs: int = 2

    def setup(self):
        super().setup()
        self.res_block = _BasicResBlock(self.conv_out_channels,
                                        dtype=self.dtype,
                                        name='res_block')
        self.conv_branch = [
            _Bottleneck(self.conv_out_channels // 4, dtype=self.dtype,
                        name=f'conv_branch{i}')
            for i in range(self.num_convs)]
        self.fc_branch = [
            nn.Dense(self.fc_out_channels, dtype=self.dtype,
                     name=f'fc_branch{i}') for i in range(self.num_fcs)]

    def __call__(self, x_cls, x_reg=None, train: bool = False):
        if x_reg is None:
            x_reg = x_cls
        x_conv = self.res_block(x_reg, train=train)
        for conv in self.conv_branch:
            x_conv = conv(x_conv, train=train)
        x_conv = jnp.mean(x_conv, axis=(1, 2))
        bbox_pred = self.fc_reg(x_conv)
        x_fc = x_cls.reshape(x_cls.shape[0], -1)
        for fc in self.fc_branch:
            x_fc = nn.relu(fc(x_fc))
        cls_score = self.fc_cls(x_fc)
        return cls_score, bbox_pred


@HEADS.register_module()
class DoubleHeadRoIHead(StandardRoIHead):
    reg_roi_scale_factor: float = 1.0

    def _bbox_forward(self, feats, rois, train: bool = False):
        cls_feats = self._bbox_extractor(feats, rois)
        reg_feats = self._bbox_extractor(
            feats, rois, roi_scale_factor=self.reg_roi_scale_factor)
        return self._bbox_head(cls_feats, reg_feats, train=train)
