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

        self.octave_base_scale = octave_base_scale
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


@ANCHOR_GENERATORS.register_module()
class SSDAnchorGenerator(AnchorGenerator):
    """SSD anchors (reference: anchor_generator.py:350). Per level:
    min/max sizes from ``basesize_ratio_range``, base anchors reordered
    so the sqrt(max/min)-scale square anchor sits at index 1."""

    def __init__(self, strides, ratios, basesize_ratio_range,
                 input_size: int = 300, scale_major: bool = False):
        self.strides = [s if isinstance(s, (tuple, list)) else (s, s)
                        for s in strides]
        self.input_size = input_size
        self.centers = [(s[0] / 2., s[1] / 2.) for s in self.strides]
        self.basesize_ratio_range = basesize_ratio_range

        min_ratio, max_ratio = basesize_ratio_range
        min_ratio = int(min_ratio * 100)
        max_ratio = int(max_ratio * 100)
        step = int(np.floor(max_ratio - min_ratio) / (len(strides) - 2))
        min_sizes, max_sizes = [], []
        for ratio in range(int(min_ratio), int(max_ratio) + 1, step):
            min_sizes.append(int(input_size * ratio / 100))
            max_sizes.append(int(input_size * (ratio + step) / 100))
        if input_size == 300:
            if basesize_ratio_range[0] == 0.15:        # SSD300 COCO
                min_sizes.insert(0, int(input_size * 7 / 100))
                max_sizes.insert(0, int(input_size * 15 / 100))
            elif basesize_ratio_range[0] == 0.2:       # SSD300 VOC
                min_sizes.insert(0, int(input_size * 10 / 100))
                max_sizes.insert(0, int(input_size * 20 / 100))
            else:
                raise ValueError(
                    'basesize_ratio_range[0] should be 0.15 or 0.2 '
                    f'for input_size 300, got {basesize_ratio_range[0]}')
        elif input_size == 512:
            if basesize_ratio_range[0] == 0.1:         # SSD512 COCO
                min_sizes.insert(0, int(input_size * 4 / 100))
                max_sizes.insert(0, int(input_size * 10 / 100))
            elif basesize_ratio_range[0] == 0.15:      # SSD512 VOC
                min_sizes.insert(0, int(input_size * 7 / 100))
                max_sizes.insert(0, int(input_size * 15 / 100))
            else:
                raise ValueError(
                    'basesize_ratio_range[0] should be 0.1 or 0.15 '
                    f'for input_size 512, got {basesize_ratio_range[0]}')
        else:
            raise ValueError('input_size must be 300 or 512, '
                             f'got {input_size}')

        self.base_sizes = min_sizes
        self.scale_major = scale_major
        self.center_offset = 0.0
        self._level_scales = []
        self._level_ratios = []
        for k in range(len(self.strides)):
            scales = [1., np.sqrt(max_sizes[k] / min_sizes[k])]
            anchor_ratio = [1.]
            for r in ratios[k]:
                anchor_ratio += [1 / r, r]
            self._level_scales.append(np.array(scales, np.float64))
            self._level_ratios.append(np.array(anchor_ratio, np.float64))
        self.base_anchors = self.gen_base_anchors()

    def gen_base_anchors(self):
        out = []
        for i, base_size in enumerate(self.base_sizes):
            base = self.gen_single_level_base_anchors(
                base_size, self._level_scales[i], self._level_ratios[i],
                self.centers[i])
            # keep [min-size 1:1, sqrt-size 1:1, ratio anchors...]
            # (reference :449-452: of the scales x ratios product, drop
            # the sqrt-scale duplicates of non-1 ratios)
            indices = list(range(len(self._level_ratios[i])))
            indices.insert(1, len(indices))
            out.append(base[np.array(indices)])
        return out


@ANCHOR_GENERATORS.register_module()
class YOLOAnchorGenerator(AnchorGenerator):
    """Per-level explicit (w, h) base sizes (reference:
    anchor_generator.py:595)."""

    def __init__(self, strides, base_sizes):
        self.strides = [s if isinstance(s, (tuple, list)) else (s, s)
                        for s in strides]
        self.centers = [(s[0] / 2., s[1] / 2.) for s in self.strides]
        self.base_sizes = [
            [bs if isinstance(bs, (tuple, list)) else (bs, bs)
             for bs in level] for level in base_sizes]
        self.base_anchors = self.gen_base_anchors()

    @property
    def num_levels(self):
        return len(self.base_sizes)

    def gen_base_anchors(self):
        out = []
        for i, level in enumerate(self.base_sizes):
            x_c, y_c = self.centers[i]
            anchors = [[x_c - 0.5 * w, y_c - 0.5 * h,
                        x_c + 0.5 * w, y_c + 0.5 * h]
                       for (w, h) in level]
            out.append(np.asarray(anchors, np.float32))
        return out

    def responsible_flags(self, featmap_sizes, gt_bboxes, gt_valid):
        """Anchors in the grid cell containing a gt centre (reference:
        anchor_generator.py:667 responsible_flags). gt padded (G, 4) with
        ``gt_valid``; invalid gts claim nothing."""
        flags = []
        for lvl in range(self.num_levels):
            fh, fw = featmap_sizes[lvl]
            sx, sy = self.strides[lvl]
            cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
            cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
            gx = jnp.floor(cx / sx).astype(jnp.int32)
            gy = jnp.floor(cy / sy).astype(jnp.int32)
            idx = gy * fw + gx
            # out-of-range index for invalid gts → dropped by mode='drop'
            idx = jnp.where(gt_valid, idx, fh * fw)
            grid = jnp.zeros((fh * fw,), bool).at[idx].set(
                True, mode='drop')
            flags.append(jnp.repeat(grid, self.num_base_anchors[lvl]))
        return flags


@ANCHOR_GENERATORS.register_module()
class LegacyAnchorGenerator(AnchorGenerator):
    """MMDet v1.x anchor grid (reference: core/anchor/
    anchor_generator.py:474): center offset 0.5, w/h minus 1 in
    center/corner math, rounded corners."""

    def __init__(self, *args, center_offset: float = 0.5, **kwargs):
        super().__init__(*args, center_offset=center_offset, **kwargs)

    def gen_single_level_base_anchors(self, base_size, scales, ratios,
                                      center=None) -> np.ndarray:
        w = h = float(base_size)
        if center is None:
            x_c = self.center_offset * (w - 1)
            y_c = self.center_offset * (h - 1)
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
        base = np.stack([x_c - 0.5 * (ws - 1), y_c - 0.5 * (hs - 1),
                         x_c + 0.5 * (ws - 1), y_c + 0.5 * (hs - 1)],
                        axis=-1)
        return np.round(base).astype(np.float32)


@ANCHOR_GENERATORS.register_module()
class LegacySSDAnchorGenerator(SSDAnchorGenerator):
    """MMDet v1.x SSD anchors (reference: core/anchor/
    anchor_generator.py:582 LegacySSDAnchorGenerator): SSD size/ratio
    schedule with legacy centers ((stride-1)/2) and the v1 rounded
    (w-1)-style corner math."""

    # borrow the v1 base-anchor math
    gen_single_level_base_anchors = \
        LegacyAnchorGenerator.gen_single_level_base_anchors

    def __init__(self, strides, ratios, basesize_ratio_range,
                 input_size: int = 300, scale_major: bool = False):
        super().__init__(strides, ratios, basesize_ratio_range,
                         input_size=input_size, scale_major=scale_major)
        self.centers = [((s[0] - 1) / 2., (s[1] - 1) / 2.)
                        for s in self.strides]
        self.base_anchors = self.gen_base_anchors()
