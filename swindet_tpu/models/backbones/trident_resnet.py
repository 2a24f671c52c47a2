"""TridentNet backbone (reference: mmdet/models/backbones/
trident_resnet.py:227; arXiv:1901.01892).

Stem + stages 1-2 are plain ResNet; stage 3 is replaced by trident
bottlenecks whose 3×3 conv SHARES ONE WEIGHT across ``num_branch``
branches that differ only in dilation. TPU-native branch layout: the
branch axis is folded into the batch — in train mode the final block
concatenates the branches along batch, so the whole detector downstream
(RPN targets, RoI sampling) sees a 3×B batch of per-branch images
exactly as the reference's list-of-branches does after its
``concat_output``. At test time only ``test_branch_idx`` runs, giving
single-branch inference for free (reference TridentConv.forward).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import BACKBONES
from .resnet import ARCH_SETTINGS, BasicBlock, Bottleneck, make_norm

Dtype = Any


class TridentConv(nn.Module):
    """One weight, per-branch dilation (reference trident_resnet.py:12)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    trident_dilations: Sequence[int] = (1, 2, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs):
        k = self.kernel_size
        cin = xs[0].shape[-1]
        w = self.param('weight', nn.initializers.he_uniform(),
                       (k, k, cin, self.features))
        outs = []
        for x, d in zip(xs, self.trident_dilations):
            outs.append(jax.lax.conv_general_dilated(
                x.astype(self.dtype), w.astype(self.dtype),
                window_strides=(self.stride,) * 2,
                padding=[(d,) * 2] * 2, rhs_dilation=(d, d),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC')))
        return outs


class TridentBottleneck(nn.Module):
    """Bottleneck over a list of branches with shared parameters
    (reference trident_resnet.py:92)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    trident_dilations: Sequence[int] = (1, 2, 3)
    concat_output: bool = False
    norm_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        conv1 = nn.Conv(self.planes, (1, 1), use_bias=False,
                        dtype=self.dtype, name='conv1')
        bn1 = make_norm(self.norm_cfg, 'bn1')
        conv2 = TridentConv(self.planes, 3, stride=self.stride,
                            trident_dilations=self.trident_dilations,
                            dtype=self.dtype, name='conv2')
        bn2 = make_norm(self.norm_cfg, 'bn2')
        conv3 = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                        dtype=self.dtype, name='conv3')
        bn3 = make_norm(self.norm_cfg, 'bn3')

        identities = xs
        if self.downsample:
            ds_conv = nn.Conv(self.planes * 4, (1, 1),
                              strides=self.stride, use_bias=False,
                              dtype=self.dtype, name='downsample.0')
            ds_bn = make_norm(self.norm_cfg, 'downsample.1')
            identities = [ds_bn(ds_conv(x)).astype(self.dtype)
                          for x in xs]

        out = [nn.relu(bn1(conv1(x))).astype(self.dtype) for x in xs]
        out = conv2(out)
        out = [nn.relu(bn2(o)).astype(self.dtype) for o in out]
        out = [bn3(conv3(o)).astype(self.dtype) for o in out]
        out = [nn.relu(o + i) for o, i in zip(out, identities)]
        if self.concat_output:
            return jnp.concatenate(out, axis=0)
        return out


@BACKBONES.register_module()
class TridentResNet(nn.Module):
    """R50/R101/R152, num_stages must be 3 (C4 output at stride 16)."""
    depth: int = 50
    num_branch: int = 3
    test_branch_idx: int = 1
    trident_dilations: Sequence[int] = (1, 2, 3)
    num_stages: int = 3
    strides: Sequence[int] = (1, 2, 2)
    dilations: Sequence[int] = (1, 1, 1)
    out_indices: Sequence[int] = (2,)
    frozen_stages: int = -1
    base_channels: int = 64
    norm_cfg: Optional[dict] = None
    norm_eval: bool = True
    style: str = 'pytorch'
    pretrained: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.num_stages == 3
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        assert block_cls is Bottleneck
        x = x.astype(self.dtype)
        x = nn.Conv(self.base_channels, (7, 7), strides=2,
                    padding=[(3, 3)] * 2, use_bias=False,
                    dtype=self.dtype, name='conv1')(x)
        x = make_norm(self.norm_cfg, 'bn1')(x)
        x = nn.relu(x).astype(self.dtype)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        planes = self.base_channels
        inplanes = self.base_channels
        for i in range(2):                       # plain stages 1-2
            for j in range(stage_blocks[i]):
                need_ds = (j == 0 and
                           (self.strides[i] != 1 or
                            inplanes != planes * 4))
                x = Bottleneck(planes=planes,
                               stride=self.strides[i] if j == 0 else 1,
                               downsample=need_ds,
                               dilation=self.dilations[i],
                               norm_cfg=self.norm_cfg, dtype=self.dtype,
                               name=f'layer{i + 1}.{j}')(x, train=train)
            if i + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            inplanes = planes * 4
            planes *= 2

        # trident stage 3: branches share weights, differ in dilation
        if train or self.test_branch_idx == -1:
            dils = tuple(self.trident_dilations)
        else:
            dils = (self.trident_dilations[self.test_branch_idx],)
        xs = [x] * len(dils)
        n3 = stage_blocks[2]
        for j in range(n3):
            xs = TridentBottleneck(
                planes=planes,
                stride=self.strides[2] if j == 0 else 1,
                downsample=(j == 0),
                trident_dilations=dils,
                concat_output=(j == n3 - 1),
                norm_cfg=self.norm_cfg, dtype=self.dtype,
                name=f'layer3.{j}')(xs, train=train)
        # xs is now a (num_branch*B, H, W, C) array
        return (xs,)
