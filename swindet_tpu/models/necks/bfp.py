"""BFP — Balanced Feature Pyramid (reference: mmdet/models/necks/
bfp.py:10, Libra R-CNN arXiv:1904.02701): gather all levels to the
refine level, average, refine, scatter back residually.

The reference's optional non-local refine block is implemented as a
dense embedded-Gaussian attention over the (small) refine-level grid —
a plain matmul pair, which is exactly what the MXU wants.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import NECKS
from ..layers import ConvModule, resize_nearest


def _adaptive_max_pool(x, out_hw):
    """torch adaptive_max_pool2d for integer-ratio shrinks (the only
    case BFP hits: power-of-two pyramids)."""
    h, w = x.shape[1:3]
    oh, ow = out_hw
    kh, kw = h // oh, w // ow
    return nn.max_pool(x, (kh, kw), strides=(kh, kw))


class NonLocal2d(nn.Module):
    """Embedded-Gaussian non-local block (mmcv NonLocal2d semantics)."""
    reduction: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        inter = max(c // self.reduction, 1)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype,
                        name='theta')(x).reshape(b, h * w, inter)
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype,
                      name='phi')(x).reshape(b, h * w, inter)
        g = nn.Conv(inter, (1, 1), dtype=self.dtype,
                    name='g')(x).reshape(b, h * w, inter)
        attn = jax.nn.softmax(
            jnp.einsum('bic,bjc->bij', theta, phi).astype(jnp.float32),
            axis=-1).astype(x.dtype)
        y = jnp.einsum('bij,bjc->bic', attn, g).reshape(b, h, w, inter)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name='conv_out')(y)
        return x + y


@NECKS.register_module()
class BFP(nn.Module):
    in_channels: int = 256
    num_levels: int = 5
    refine_level: int = 2
    refine_type: Optional[str] = None   # None | 'conv' | 'non_local'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray],
                 train: bool = False) -> Tuple[jnp.ndarray, ...]:
        assert len(inputs) == self.num_levels
        gather_hw = inputs[self.refine_level].shape[1:3]
        feats = []
        for i in range(self.num_levels):
            if i < self.refine_level:
                feats.append(_adaptive_max_pool(inputs[i], gather_hw))
            else:
                feats.append(resize_nearest(inputs[i], gather_hw))
        bsf = sum(feats) / len(feats)

        if self.refine_type == 'conv':
            bsf = ConvModule(self.in_channels, 3, padding=1,
                             dtype=self.dtype, name='refine')(
                                 bsf, train=train)
        elif self.refine_type == 'non_local':
            bsf = NonLocal2d(dtype=self.dtype, name='refine')(
                bsf, train=train)

        outs = []
        for i in range(self.num_levels):
            out_hw = inputs[i].shape[1:3]
            if i < self.refine_level:
                residual = resize_nearest(bsf, out_hw)
            else:
                residual = _adaptive_max_pool(bsf, out_hw)
            outs.append(residual + inputs[i])
        return tuple(outs)
