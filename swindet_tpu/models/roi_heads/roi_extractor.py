"""SingleRoIExtractor (reference: mmdet/models/roi_heads/roi_extractors/
single_level_roi_extractor.py:9).

Thin config shell over ops.roi_align.multilevel_roi_align: FPN level
routing via floor(log2(sqrt(wh)/finest_scale)) and one flat gather. The
reference's dead-level gradient hack (:99-107) is unnecessary — every
parameter participates in the jitted graph by construction.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as _nn

from ..builder import ROI_EXTRACTORS
from ...ops.roi_align import multilevel_roi_align, roi_align_single


_DEFORM_LAYERS = ('DeformRoIPoolPack', 'ModulatedDeformRoIPoolPack')


@ROI_EXTRACTORS.register_module()
class SingleRoIExtractor:
    def __new__(cls, roi_layer: dict = None, out_channels: int = 256,
                featmap_strides: Sequence[int] = (4, 8, 16, 32),
                finest_scale: int = 56, **kwargs):
        # configs/dcn/*_{dpool,mdpool}_* select deformable RoI pooling
        # through the roi_layer type while keeping the extractor type —
        # those layers carry parameters, so dispatch to the flax module
        if roi_layer and roi_layer.get('type') in _DEFORM_LAYERS:
            return DeformRoIExtractor(
                roi_layer=dict(roi_layer), out_channels=out_channels,
                featmap_strides=tuple(featmap_strides),
                finest_scale=finest_scale)
        return super().__new__(cls)

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


class DeformRoIExtractor(_nn.Module):
    """SingleRoIExtractor with a DeformRoIPoolPack / Modulated... layer
    (reference configs: configs/dcn/faster_rcnn_r50_fpn_{dpool,mdpool}_
    1x_coco.py; op semantics: mmcv deform_roi_pool).

    Two-pass pooling: a standard aligned-RoIAlign pass feeds a 3-layer
    FC branch (deform_fc_channels wide, zero-init output) predicting a
    per-bin (dx, dy) offset; the second pass samples at the deformed
    bins. The modulated variant adds a sigmoid mask branch (zero-init →
    0.5) multiplying the pooled features. Parity with mmcv:

    - one pack (own FC weights) PER pyramid level, as in torch's
      ``roi_layers`` ModuleList — each roi uses the pack of the level
      it routes to. Every pack runs on every roi (stacked GEMMs) and a
      level one-hot selects the result: static shapes, exact semantics.
    - offset_fc has TWO hidden Linears, mask_fc has ONE
      (mmcv deform_roi_pool.py Sequential layouts).
    - FC input flattened in torch's NCHW order so converted ``.pth``
      fc weights line up row-for-row (only the OUTPUT layers are
      zero-init; fc1/fc2 carry trained weights in released dpool
      checkpoints). Converter: ``_translate_dpool_keys``.
    """
    roi_layer: dict
    out_channels: int
    featmap_strides: Sequence[int]
    finest_scale: int = 56

    @property
    def num_inputs(self):
        return len(self.featmap_strides)

    @_nn.compact
    def __call__(self, feats, rois, roi_valid=None,
                 roi_scale_factor=None, train: bool = False):
        from ...ops.deform_roi_pool import multilevel_deform_roi_pool
        from ..layers import normal_init
        if roi_scale_factor is not None:
            rois = SingleRoIExtractor.roi_rescale(rois, roi_scale_factor)
        out_size = self.roi_layer['output_size']
        gamma = self.roi_layer.get('gamma', 0.1)
        sr = self.roi_layer.get('sampling_ratio', 0)
        fcc = self.roi_layer.get('deform_fc_channels', 1024)
        modulated = self.roi_layer['type'] == 'ModulatedDeformRoIPoolPack'
        feats = list(feats)[:self.num_inputs]

        base = multilevel_roi_align(
            feats, rois, self.featmap_strides, out_size, sr,
            self.finest_scale, roi_valid=roi_valid)
        n_rois = rois.shape[0]
        # NCHW flatten (torch nn.Linear sees C·H·W rows) for .pth parity
        flat = jnp.moveaxis(base, -1, 1).reshape(n_rois, -1)

        from ...ops.roi_align import map_roi_levels
        lvl = map_roi_levels(rois, self.num_inputs, self.finest_scale)
        lvl_onehot = jax.nn.one_hot(lvl, self.num_inputs)  # (R, L)

        def branch(name, out_dim, hidden):
            # One pack per level (torch roi_layers.{l}.{name}_fc.*);
            # all packs run on all rois, the roi's level picks one.
            per_level = []
            for li in range(self.num_inputs):
                h = flat
                for k in range(hidden):
                    h = _nn.relu(_nn.Dense(
                        fcc, kernel_init=normal_init(0.01),
                        name=f'roi_layers{li}_{name}_fc{k + 1}')(h))
                per_level.append(_nn.Dense(
                    out_dim, kernel_init=_nn.initializers.zeros,
                    name=f'roi_layers{li}_{name}_out')(h))
            stacked = jnp.stack(per_level)                 # (L, R, D)
            return jnp.einsum('rl,lrd->rd', lvl_onehot, stacked)

        off = branch('offset', out_size * out_size * 2, hidden=2)
        # mmcv layout (R, 2, H, W): first H*W block = dx, second = dy
        off = off.reshape(n_rois, 2, out_size, out_size)
        off = jnp.moveaxis(off, 1, -1)                     # (R, H, W, 2)
        out = multilevel_deform_roi_pool(
            feats, rois, off, self.featmap_strides, out_size, sr,
            gamma, self.finest_scale, roi_valid=roi_valid)
        if modulated:
            m = _nn.sigmoid(branch('mask', out_size * out_size, hidden=1))
            out = out * m.reshape(n_rois, out_size, out_size, 1)
        return out


@ROI_EXTRACTORS.register_module()
class GenericRoIExtractor(_nn.Module):
    """GRoIE — aggregate RoI features from ALL pyramid levels
    (reference: mmdet/models/roi_heads/roi_extractors/
    generic_roi_extractor.py:9; arXiv:2004.13665).

    Unlike SingleRoIExtractor there is no level routing: every RoI is
    aligned on every level, optionally passed through a learnable
    ``pre`` module per level, summed (or concatenated), then through a
    learnable ``post`` module. Implemented as a flax module because the
    pre/post processors carry parameters."""
    roi_layer: dict
    out_channels: int
    featmap_strides: Sequence[int]
    aggregation: str = 'sum'
    pre_cfg: Optional[dict] = None
    post_cfg: Optional[dict] = None

    @property
    def num_inputs(self):
        return len(self.featmap_strides)

    def _processor(self, cfg, name):
        cfg = dict(cfg)
        t = cfg.pop('type')
        if t == 'ConvModule':
            from ..layers import ConvModule
            cfg.pop('in_channels', None)
            cfg.pop('inplace', None)
            return ConvModule(out_channels=cfg.pop('out_channels'),
                              name=name, **cfg)
        from ...ops.plugins import build_plugin
        cfg.pop('in_channels', None)
        return build_plugin(dict(cfg, type=t),
                            in_channels=self.out_channels, name=name)

    @_nn.compact
    def __call__(self, feats, rois, roi_valid=None,
                 roi_scale_factor=None, train: bool = False):
        if roi_scale_factor is not None:
            rois = SingleRoIExtractor.roi_rescale(rois, roi_scale_factor)
        out_size = self.roi_layer['output_size']
        sampling_ratio = self.roi_layer.get('sampling_ratio', 0)
        acc = None
        parts = []
        # one pre module SHARED across levels (reference :40)
        pre = (self._processor(self.pre_cfg, 'pre_module')
               if self.pre_cfg is not None else None)
        for i, stride in enumerate(self.featmap_strides):
            rf = roi_align_single(feats[i], rois, 1.0 / stride,
                                  out_size, sampling_ratio)
            if pre is not None:
                rf = pre(rf)
            if self.aggregation == 'sum':
                acc = rf if acc is None else acc + rf
            else:
                parts.append(rf)
        out = acc if self.aggregation == 'sum' \
            else jnp.concatenate(parts, axis=-1)
        if self.post_cfg is not None:
            out = self._processor(self.post_cfg, 'post_module')(out)
        if roi_valid is not None:
            out = out * roi_valid.reshape(-1, 1, 1, 1).astype(out.dtype)
        return out
