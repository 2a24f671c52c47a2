"""Anchor / point generation (reference: mmdet/core/anchor/
anchor_generator.py:10, point_generator.py).

Anchors for a given feature-map size are trace-time constants on TPU:
`grid_anchors` is pure jnp over static shapes, so under jit each padded
input bucket gets its anchors constant-folded by XLA.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..registries import ANCHOR_GENERATORS


@ANCHOR_GENERATORS.register_module()
class AnchorGenerator:
    """Standard multi-level grid anchors.

    Matches reference semantics (anchor_generator.py:142-271): per level,
    base anchors = outer product of ``scales`` and ``ratios`` around a
    ``center_offset``-positioned centre; grid anchors = base + stride shifts.
    """

    def __init__(self,
                 strides: Sequence,
                 ratios: Sequence[float],
                 scales: Optional[Sequence[float]] = None,
                 base_sizes: Optional[Sequence[int]] = None,
                 scale_major: bool = True,
                 octave_base_scale: Optional[float] = None,
                 scales_per_octave: Optional[int] = None,
                 centers: Optional[Sequence[Tuple[float, float]]] = None,
                 center_offset: float = 0.):
        self.strides = [s if isinstance(s, (tuple, list)) else (s, s)
                        for s in strides]
        self.base_sizes = ([min(s) for s in self.strides]
                           if base_sizes is None else list(base_sizes))
        assert len(self.base_sizes) == len(self.strides)

        if octave_base_scale is not None and scales_per_octave is not None:
            octave_scales = np.array(
                [2**(i / scales_per_octave) for i in range(scales_per_octave)])
            self.scales = octave_scales * octave_base_scale
        elif scales is not None:
            self.scales = np.array(scales, dtype=np.float64)
        else:
            raise ValueError('either scales or octave args must be set')
        self.ratios = np.array(ratios, dtype=np.float64)
        self.scale_major = scale_major
        self.centers = centers
        self.center_offset = center_offset
        self.base_anchors = self.gen_base_anchors()

    @property
    def num_base_anchors(self) -> List[int]:
        return [a.shape[0] for a in self.base_anchors]

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    def gen_base_anchors(self) -> List[np.ndarray]:
        out = []
        for i, base_size in enumerate(self.base_sizes):
            center = self.centers[i] if self.centers is not None else None
            out.append(self.gen_single_level_base_anchors(
                base_size, self.scales, self.ratios, center))
        return out

    def gen_single_level_base_anchors(self, base_size, scales, ratios,
                                      center=None) -> np.ndarray:
        w = h = float(base_size)
        if center is None:
            x_c = self.center_offset * w
            y_c = self.center_offset * h
        else:
            x_c, y_c = center
        h_ratios = np.sqrt(ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * scales[None, :]).reshape(-1)
        else:
            ws = (w * scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * scales[:, None] * h_ratios[None, :]).reshape(-1)
        base = np.stack([x_c - 0.5 * ws, y_c - 0.5 * hs,
                         x_c + 0.5 * ws, y_c + 0.5 * hs], axis=-1)
        return base.astype(np.float32)

    def grid_anchors(self, featmap_sizes: Sequence[Tuple[int, int]],
                     dtype=jnp.float32) -> List[jnp.ndarray]:
        """All anchors per level for static featmap sizes.

        Returns list of (H*W*num_base, 4) arrays, row-major over the grid
        with base-anchor index fastest (reference ordering).
        """
        assert len(featmap_sizes) == self.num_levels
        out = []
        for lvl, (fh, fw) in enumerate(featmap_sizes):
            sw, sh = self.strides[lvl]
            shift_x = np.arange(fw, dtype=np.float32) * sw
            shift_y = np.arange(fh, dtype=np.float32) * sh
            sx, sy = np.meshgrid(shift_x, shift_y)
            shifts = np.stack([sx.ravel(), sy.ravel(),
                               sx.ravel(), sy.ravel()], axis=-1)
            anchors = (self.base_anchors[lvl][None, :, :]
                       + shifts[:, None, :]).reshape(-1, 4)
            out.append(jnp.asarray(anchors, dtype))
        return out

    def valid_flags(self, featmap_sizes: Sequence[Tuple[int, int]],
                    pad_shape: Tuple[int, int]) -> List[jnp.ndarray]:
        """Per-level bool flags marking anchors whose grid cell lies inside
        the (possibly traced) valid image region of the padded canvas
        (reference: anchor_generator.py:272-329)."""
        out = []
        for lvl, (fh, fw) in enumerate(featmap_sizes):
            sw, sh = self.strides[lvl]
            # ceil(valid / stride), computed on traced values
            vh = jnp.minimum((pad_shape[0] + sh - 1) // sh, fh)
            vw = jnp.minimum((pad_shape[1] + sw - 1) // sw, fw)
            vx = jnp.arange(fw) < vw
            vy = jnp.arange(fh) < vh
            valid = (vy[:, None] & vx[None, :]).reshape(-1)
            valid = jnp.repeat(valid, self.num_base_anchors[lvl])
            out.append(valid)
        return out

    def __repr__(self):
        return (f'AnchorGenerator(strides={self.strides}, '
                f'ratios={self.ratios.tolist()}, '
                f'scales={self.scales.tolist()})')


@ANCHOR_GENERATORS.register_module()
class PointGenerator:
    """Grid points for anchor-free heads (reference: point_generator.py)."""

    def grid_points(self, featmap_size: Tuple[int, int], stride: int = 16,
                    dtype=jnp.float32) -> jnp.ndarray:
        fh, fw = featmap_size
        shift_x = np.arange(0., fw) * stride
        shift_y = np.arange(0., fh) * stride
        sx, sy = np.meshgrid(shift_x, shift_y)
        strides = np.full_like(sx.ravel(), stride)
        points = np.stack([sx.ravel(), sy.ravel(), strides], axis=-1)
        return jnp.asarray(points, dtype)

    def valid_flags(self, featmap_size: Tuple[int, int],
                    valid_size) -> jnp.ndarray:
        fh, fw = featmap_size
        vh, vw = valid_size
        vx = jnp.arange(fw) < vw
        vy = jnp.arange(fh) < vh
        return (vy[:, None] & vx[None, :]).reshape(-1)


def images_to_levels(target: jnp.ndarray,
                     num_levels: Sequence[int]) -> List[jnp.ndarray]:
    """Split a (B, total_anchors, ...) image-major tensor into a per-level
    list (reference: mmdet/core/anchor/utils.py:4). Pure reshape on TPU —
    no gather needed since anchors are concatenated level-major."""
    out = []
    start = 0
    for n in num_levels:
        out.append(target[:, start:start + n])
        start += n
    return out


def anchor_inside_flags(flat_anchors: jnp.ndarray,
                        valid_flags: jnp.ndarray,
                        img_shape,
                        allowed_border: int = 0) -> jnp.ndarray:
    """Border filtering (reference: anchor/utils.py:20)."""
    if allowed_border < 0:
        return valid_flags
    h, w = img_shape[0], img_shape[1]
    return (valid_flags
            & (flat_anchors[:, 0] >= -allowed_border)
            & (flat_anchors[:, 1] >= -allowed_border)
            & (flat_anchors[:, 2] < w + allowed_border)
            & (flat_anchors[:, 3] < h + allowed_border))
