"""RetinaHead (reference: mmdet/models/dense_heads/retina_head.py) —
4-conv cls/reg towers + 3×3 prediction convs over octave anchors,
focal-loss classification. All machinery inherited from AnchorHead.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS
from ..layers import ConvModule
from .anchor_head import AnchorHead


@HEADS.register_module()
class RetinaHead(AnchorHead):
    stacked_convs: int = 4
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None

    def _init_layers(self):
        # reference retina_head.py init_weights: towers + preds
        # normal_init(std=0.01), cls bias at the focal prior (-4.595)
        from ..layers import bias_prob_init, normal_init
        self.cls_convs = [
            ConvModule(self.feat_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, act_cfg=dict(type='ReLU'),
                       dtype=self.dtype, kernel_init=normal_init(0.01),
                       name=f'cls_convs{i}')
            for i in range(self.stacked_convs)]
        self.reg_convs = [
            ConvModule(self.feat_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, act_cfg=dict(type='ReLU'),
                       dtype=self.dtype, kernel_init=normal_init(0.01),
                       name=f'reg_convs{i}')
            for i in range(self.stacked_convs)]
        self.retina_cls = nn.Conv(
            self.num_base_priors * self.cls_out_channels, (3, 3),
            padding=[(1, 1), (1, 1)], dtype=self.dtype,
            kernel_init=normal_init(0.01), bias_init=bias_prob_init(0.01),
            name='retina_cls')
        self.retina_reg = nn.Conv(
            self.num_base_priors * 4, (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.dtype, kernel_init=normal_init(0.01),
            name='retina_reg')

    def forward_single(self, x, train: bool = False):
        cls_feat = x
        reg_feat = x
        for conv in self.cls_convs:
            cls_feat = conv(cls_feat, train=train)
        for conv in self.reg_convs:
            reg_feat = conv(reg_feat, train=train)
        return self.retina_cls(cls_feat), self.retina_reg(reg_feat)
