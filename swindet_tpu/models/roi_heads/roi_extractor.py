"""SingleRoIExtractor (reference: mmdet/models/roi_heads/roi_extractors/
single_level_roi_extractor.py:9).

Thin config shell over ops.roi_align.multilevel_roi_align: FPN level
routing via floor(log2(sqrt(wh)/finest_scale)) and one flat gather. The
reference's dead-level gradient hack (:99-107) is unnecessary — every
parameter participates in the jitted graph by construction.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from ..builder import ROI_EXTRACTORS
from ...ops.roi_align import multilevel_roi_align


@ROI_EXTRACTORS.register_module()
class SingleRoIExtractor:
    def __init__(self, roi_layer: dict, out_channels: int,
                 featmap_strides: Sequence[int],
                 finest_scale: int = 56, **kwargs):
        assert roi_layer.get('type', 'RoIAlign') == 'RoIAlign'
        self.out_size = roi_layer['output_size']
        # 0 = mmcv adaptive sampling (per-RoI ceil(extent/out), capped —
        # see ops/roi_align.py SR0_GMAX)
        self.sampling_ratio = roi_layer.get('sampling_ratio', 0)
        self.out_channels = out_channels
        self.featmap_strides = list(featmap_strides)
        self.finest_scale = finest_scale

    @property
    def num_inputs(self):
        return len(self.featmap_strides)

    @staticmethod
    def roi_rescale(rois: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
        """Scale roi extents around their centres (reference:
        base_roi_extractor.py:57 — Double-Head's larger reg receptive
        field)."""
        cx = (rois[:, 1] + rois[:, 3]) * 0.5
        cy = (rois[:, 2] + rois[:, 4]) * 0.5
        w = (rois[:, 3] - rois[:, 1]) * scale_factor
        h = (rois[:, 4] - rois[:, 2]) * scale_factor
        return jnp.stack([rois[:, 0], cx - w * 0.5, cy - h * 0.5,
                          cx + w * 0.5, cy + h * 0.5], axis=-1)

    def __call__(self, feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                 roi_valid: Optional[jnp.ndarray] = None,
                 roi_scale_factor: Optional[float] = None) -> jnp.ndarray:
        """feats: per-level NHWC; rois: (R, 5) with batch col.
        Returns (R, out, out, C)."""
        import jax
        import os
        if roi_scale_factor is not None:
            rois = self.roi_rescale(rois, roi_scale_factor)
        # Pallas strip kernel needs lane-collapsible channels (Mosaic
        # folds (S, C) for the MXU only when C is a lane multiple)
        if jax.default_backend() == 'tpu' and \
                feats[0].shape[-1] % 128 == 0 and \
                not os.environ.get('SWINDET_NO_PALLAS_ROI'):
            from ...ops.roi_align_pallas import multilevel_roi_align_pallas
            return multilevel_roi_align_pallas(
                list(feats)[:self.num_inputs], rois,
                tuple(self.featmap_strides), self.out_size,
                self.sampling_ratio, self.finest_scale,
                roi_valid=roi_valid)
        return multilevel_roi_align(
            list(feats)[:self.num_inputs], rois, self.featmap_strides,
            self.out_size, self.sampling_ratio, self.finest_scale,
            roi_valid=roi_valid)
