"""RetinaSepBNHead (reference: mmdet/models/dense_heads/
retina_sepbn_head.py:9 — NAS-FPN's head): tower CONVS shared across
FPN levels, BN separated per level. In flax, sharing = calling the
same conv module on every level while indexing a per-level norm."""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS
from ..layers import bias_prob_init, build_norm, normal_init
from .anchor_head import AnchorHead


@HEADS.register_module()
class RetinaSepBNHead(AnchorHead):
    num_ins: int = 5
    stacked_convs: int = 4
    norm_cfg: Optional[dict] = None

    def _init_layers(self):
        # shared convs (one instance, applied to every level)
        self.cls_convs = [
            nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=self.norm_cfg is None, dtype=self.dtype,
                    kernel_init=normal_init(0.01),
                    name=f'cls_convs{i}')
            for i in range(self.stacked_convs)]
        self.reg_convs = [
            nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=self.norm_cfg is None, dtype=self.dtype,
                    kernel_init=normal_init(0.01),
                    name=f'reg_convs{i}')
            for i in range(self.stacked_convs)]
        norm = self.norm_cfg or dict(type='BN')
        # per-(level, layer) norms
        self.cls_norms = [[build_norm(dict(norm),
                                      name=f'cls_norm{l}_{i}')
                           for i in range(self.stacked_convs)]
                          for l in range(self.num_ins)]
        self.reg_norms = [[build_norm(dict(norm),
                                      name=f'reg_norm{l}_{i}')
                           for i in range(self.stacked_convs)]
                          for l in range(self.num_ins)]
        self.retina_cls = nn.Conv(
            self.num_base_priors * self.cls_out_channels, (3, 3),
            padding=[(1, 1)] * 2, dtype=self.dtype,
            kernel_init=normal_init(0.01),
            bias_init=bias_prob_init(0.01), name='retina_cls')
        self.retina_reg = nn.Conv(
            self.num_base_priors * 4, (3, 3), padding=[(1, 1)] * 2,
            dtype=self.dtype, kernel_init=normal_init(0.01),
            name='retina_reg')

    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        cls_out, reg_out = [], []
        for lvl, x in enumerate(feats):
            cls_feat = x
            reg_feat = x
            for i in range(self.stacked_convs):
                cls_feat = self.cls_convs[i](cls_feat)
                cls_feat = nn.relu(self.cls_norms[lvl][i](
                    cls_feat, train=train).astype(self.dtype))
                reg_feat = self.reg_convs[i](reg_feat)
                reg_feat = nn.relu(self.reg_norms[lvl][i](
                    reg_feat, train=train).astype(self.dtype))
            cls_out.append(self.retina_cls(cls_feat))
            reg_out.append(self.retina_reg(reg_feat))
        return tuple(cls_out), tuple(reg_out)
