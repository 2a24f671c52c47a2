"""MaskedConv2d (reference: mmcv.ops.MaskedConv2d, used by
GuidedAnchor heads — guided_anchor_head.py:210).

The reference's CUDA kernel gathers the masked locations, runs an
im2col GEMM on just those columns, and scatters back — a latency win on
GPU where the loc mask is sparse. On TPU the dense 3×3/1×1 conv is MXU
work at full utilisation and the gather/scatter would serialise, so the
TPU-native formulation is: dense conv, then zero the masked-off outputs.
Semantically identical (masked-off positions are excluded from
downstream candidate sets via their validity mask; the reference leaves
them uninitialised/zero as well).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn


class MaskedConv2d(nn.Module):
    """conv(x) where mask, else 0. ``mask=None`` = plain conv (the
    reference trains without a mask and applies it only at inference)."""
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Any = None
    bias_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks, ks)
        out = nn.Conv(self.features, ks,
                      padding=[(self.padding, self.padding)] * 2,
                      use_bias=self.use_bias, dtype=self.dtype,
                      kernel_init=(self.kernel_init
                                   or nn.initializers.lecun_normal()),
                      bias_init=(self.bias_init or nn.initializers.zeros),
                      name='conv')(x)
        if mask is not None:
            # mask: (B, H, W) or (B, H, W, 1)
            if mask.ndim == out.ndim - 1:
                mask = mask[..., None]
            out = jnp.where(mask, out, 0.0)
        return out
