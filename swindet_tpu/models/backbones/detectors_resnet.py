"""DetectoRS ResNet (reference: mmdet/models/backbones/
detectors_resnet.py:205; arXiv:2006.02334) — ResNet whose bottleneck
conv2 is SAC on selected stages, with an `rfp_forward` path that
injects the recursive feature pyramid's per-stage features through a
zero-init 1×1 conv into the first block of stages 2-4."""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import BACKBONES
from ...ops.sac import SAConv2d


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


class DetBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    with_sac: bool = False
    rfp_inplanes: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rfp_feat=None, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      dtype=self.dtype, name='conv1')(x)
        out = nn.relu(_bn('bn1')(out).astype(self.dtype))
        if self.with_sac:
            out = SAConv2d(self.planes, 3, stride=self.stride,
                           dtype=self.dtype, name='conv2')(out)
        else:
            out = nn.Conv(self.planes, (3, 3), strides=self.stride,
                          padding=[(1, 1)] * 2, use_bias=False,
                          dtype=self.dtype, name='conv2')(out)
        out = nn.relu(_bn('bn2')(out).astype(self.dtype))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name='conv3')(out)
        out = _bn('bn3')(out).astype(self.dtype)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=self.stride, use_bias=False,
                               dtype=self.dtype,
                               name='downsample.0')(x)
            identity = _bn('downsample.1')(identity).astype(self.dtype)
        out = out + identity
        if self.rfp_inplanes is not None:
            rfp_out = nn.Conv(self.planes * 4, (1, 1),
                              dtype=self.dtype,
                              kernel_init=nn.initializers.zeros,
                              name='rfp_conv')(
                rfp_feat if rfp_feat is not None
                else jnp.zeros(out.shape[:3] + (self.rfp_inplanes,),
                               out.dtype))
            out = out + rfp_out
        return nn.relu(out)


@BACKBONES.register_module()
class DetectoRS_ResNet(nn.Module):
    depth: int = 50
    num_stages: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    sac: Optional[dict] = None
    stage_with_sac: Sequence[bool] = (False, False, False, False)
    rfp_inplanes: Optional[int] = None
    output_img: bool = False
    base_channels: int = 64
    norm_cfg: Any = None
    norm_eval: bool = True
    conv_cfg: Any = None
    style: str = 'pytorch'
    pretrained: Optional[str] = None
    dtype: Any = jnp.float32

    ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}

    def setup(self):
        blocks = self.ARCH[self.depth][:self.num_stages]
        self.stem_conv = nn.Conv(self.base_channels, (7, 7), strides=2,
                                 padding=[(3, 3)] * 2, use_bias=False,
                                 dtype=self.dtype, name='conv1')
        self.stem_bn = _bn('bn1')
        layers = []
        for si, n in enumerate(blocks):
            planes = self.base_channels * 2 ** si
            stage = []
            for bi in range(n):
                stage.append(DetBottleneck(
                    planes,
                    stride=(1 if si == 0 else 2) if bi == 0 else 1,
                    downsample=(bi == 0),
                    with_sac=bool(self.sac) and self.stage_with_sac[si],
                    rfp_inplanes=(self.rfp_inplanes
                                  if (si > 0 and bi == 0) else None),
                    dtype=self.dtype, name=f'layer{si + 1}.{bi}'))
            layers.append(stage)
        self.stages = layers

    def _stem(self, x):
        x = self.stem_conv(x)
        x = nn.relu(self.stem_bn(x).astype(self.dtype))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)])

    def _run(self, x, rfp_feats, train):
        img = x
        x = self._stem(x)
        outs = []
        for si, stage in enumerate(self.stages):
            rfp = rfp_feats[si] if (rfp_feats is not None and si > 0) \
                else None
            for bi, block in enumerate(stage):
                x = block(x, rfp_feat=rfp if bi == 0 else None,
                          train=train)
            if si + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if si in self.out_indices:
                outs.append(x)
        if self.output_img:
            return (img,) + tuple(outs)
        return tuple(outs)

    def __call__(self, x, train: bool = False):
        return self._run(x, None, train)

    def rfp_forward(self, x, rfp_feats, train: bool = False):
        """rfp_feats: per-stage FPN features aligned to stage strides
        (reference :281)."""
        out = self._run(x, rfp_feats, train)
        return out[1:] if self.output_img else out
