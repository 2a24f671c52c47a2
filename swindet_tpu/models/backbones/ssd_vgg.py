"""SSDVGG backbone (reference: mmdet/models/backbones/ssd_vgg.py:12 —
VGG-16 trunk + dilated fc6/fc7 convs + SSD extra layers + L2Norm on the
conv4_3 feature).

TPU-native: NHWC, bf16-capable convs, ceil-mode pooling expressed as
explicit -inf padding so shapes stay static.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..builder import BACKBONES

# VGG-16 conv plan: (num convs, out channels) per block
_VGG16_BLOCKS = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))

# SSD extra layers (reference extra_setting): channel plan with 'S'
# marking stride-2 convs
_EXTRA = {
    300: (256, 'S', 512, 128, 'S', 256, 128, 256, 128, 256),
    512: (256, 'S', 512, 128, 'S', 256, 128, 'S', 256, 128, 'S', 256, 128),
}


def _ceil_pool(x: jnp.ndarray, k: int = 2, s: int = 2) -> jnp.ndarray:
    """max-pool with torch ceil_mode=True semantics."""
    h, w = x.shape[1], x.shape[2]
    ph = (-h) % s if h % s else 0
    pw = (-w) % s if w % s else 0
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (k, k), strides=(s, s))


@BACKBONES.register_module()
class SSDVGG(nn.Module):
    input_size: int = 300
    depth: int = 16
    with_last_pool: bool = False
    ceil_mode: bool = True
    out_indices: Sequence[int] = (3, 4)
    out_feature_indices: Sequence[int] = (22, 34)
    l2_norm_scale: float = 20.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        assert self.depth == 16, 'SSD uses VGG-16'
        x = x.astype(self.dtype)
        outs = []
        conv_i = 0
        for bi, (n_convs, ch) in enumerate(_VGG16_BLOCKS):
            for _ in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype,
                            name=f'features{conv_i}')(x)
                x = nn.relu(x)
                conv_i += 1
            if bi == 3:
                conv43 = x          # conv4_3 relu output (index 22)
            if bi < 4:
                x = _ceil_pool(x) if self.ceil_mode else \
                    nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                # pool5: k3 s1 p1 (reference :55-57)
                x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                            constant_values=-jnp.inf)
                x = nn.max_pool(x, (3, 3), strides=(1, 1))
        # fc6: dilated 3x3 (reference :58-61)
        x = nn.Conv(1024, (3, 3), padding=[(6, 6)] * 2,
                    kernel_dilation=(6, 6), dtype=self.dtype,
                    name='fc6')(x)
        x = nn.relu(x)
        x = nn.Conv(1024, (1, 1), dtype=self.dtype, name='fc7')(x)
        x = nn.relu(x)
        fc7_out = x                  # index 34

        # L2Norm on conv4_3 (reference L2Norm:146)
        scale = self.param('l2_norm_scale_param',
                           nn.initializers.constant(self.l2_norm_scale),
                           (conv43.shape[-1],))
        c43 = conv43.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(c43 ** 2, -1, keepdims=True)) + 1e-10
        outs.append((scale[None, None, None, :] * c43 / norm)
                    .astype(self.dtype))
        outs.append(fc7_out)

        # extra layers: alternating 1x1(p0) / 3x3; an 'S' marks a
        # stride-2 pad-1 conv whose width is the NEXT entry
        # (reference _make_extra_layers :119-143)
        plan = _EXTRA[self.input_size]
        k_alt = (1, 3)
        li = 0
        i = 0
        while i < len(plan):
            k = k_alt[li % 2]
            if plan[i] == 'S':
                out_ch = plan[i + 1]
                x = nn.Conv(out_ch, (k, k), strides=2,
                            padding=[(1, 1)] * 2, dtype=self.dtype,
                            name=f'extra{li}')(x)
                i += 2
            else:
                out_ch = plan[i]
                x = nn.Conv(out_ch, (k, k), padding='VALID',
                            dtype=self.dtype, name=f'extra{li}')(x)
                i += 1
            x = nn.relu(x)
            if li % 2 == 1:
                outs.append(x)
            li += 1
        if self.input_size == 512:
            x = nn.Conv(256, (4, 4), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f'extra{li}')(x)
            x = nn.relu(x)
            outs.append(x)
        return tuple(outs)
