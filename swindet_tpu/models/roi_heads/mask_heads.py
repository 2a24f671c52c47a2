"""FCN mask head (reference: mmdet/models/roi_heads/mask_heads/
fcn_mask_head.py:20) + mask target building (reference:
mmdet/core/mask/mask_target.py:6).

Mask targets are produced on-device by RoIAligning the GT bitmap masks at
the sampled positive boxes (the reference does the same via mmcv
roi_align in BitmapMasks.crop_and_resize, core/mask/structures.py:328).
Full-resolution pasting happens at the host boundary
(core/masks.paste_masks) — the only step outside jit, feeding RLE encode.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS, build_loss
from ..layers import ConvModule
from ...ops.roi_align import roi_align_single


@HEADS.register_module()
class FCNMaskHead(nn.Module):
    num_convs: int = 4
    roi_feat_size: int = 14
    in_channels: int = 256
    conv_kernel_size: int = 3
    conv_out_channels: int = 256
    num_classes: int = 80
    class_agnostic: bool = False
    upsample_cfg: Optional[dict] = None
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    loss_mask: Optional[dict] = None
    dtype: Any = jnp.float32

    def _build_convs(self):
        """Conv tower — SCNetMaskHead swaps this for a res tower."""
        return [
            ConvModule(self.conv_out_channels, self.conv_kernel_size,
                       padding=self.conv_kernel_size // 2,
                       norm_cfg=self.norm_cfg, act_cfg=dict(type='ReLU'),
                       dtype=self.dtype, name=f'convs{i}')
            for i in range(self.num_convs)]

    def setup(self):
        self._loss_mask = build_loss(dict(
            self.loss_mask or dict(type='CrossEntropyLoss', use_mask=True,
                                   loss_weight=1.0)))
        self.convs = self._build_convs()
        up = self.upsample_cfg or dict(type='deconv', scale_factor=2)
        self.upsample_type = up.get('type', 'deconv')
        if self.upsample_type == 'deconv':
            self.upsample = nn.ConvTranspose(
                self.conv_out_channels, (2, 2), strides=(2, 2),
                dtype=self.dtype, name='upsample')
        elif self.upsample_type == 'carafe':
            # reference: configs/carafe mask head
            # (upsample_cfg=dict(type='carafe', ...))
            from ...ops.carafe import CARAFEPack
            self.upsample = CARAFEPack(
                channels=self.conv_out_channels,
                scale_factor=up.get('scale_factor', 2),
                up_kernel=up.get('up_kernel', 5),
                up_group=up.get('up_group', 1),
                encoder_kernel=up.get('encoder_kernel', 3),
                encoder_dilation=up.get('encoder_dilation', 1),
                compressed_channels=up.get('compressed_channels', 64),
                dtype=self.dtype, name='upsample')
        out = 1 if self.class_agnostic else self.num_classes
        self.conv_logits = nn.Conv(out, (1, 1), dtype=self.dtype,
                                   name='conv_logits')

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(R, 14, 14, C) → (R, 28, 28, num_classes) logits."""
        for conv in self.convs:
            x = conv(x, train=train)
        if self.upsample_type == 'deconv':
            x = nn.relu(self.upsample(x))
        elif self.upsample_type == 'carafe':
            x = nn.relu(self.upsample(x))
        elif self.upsample_type in ('bilinear', 'nearest'):
            b, h, w, c = x.shape
            sf = (self.upsample_cfg or {}).get('scale_factor', 2)
            x = jax.image.resize(
                x, (b, h * sf, w * sf, c),
                'bilinear' if self.upsample_type == 'bilinear'
                else 'nearest')
        return self.conv_logits(x)

    # ------------------------------------------------------------- targets
    @staticmethod
    def get_targets(gt_masks: jnp.ndarray, pos_boxes: jnp.ndarray,
                    pos_gt_inds: jnp.ndarray, mask_size: int) -> jnp.ndarray:
        """Crop+resize GT masks to (M, s, s) binary targets for one image.

        gt_masks: (G, H, W) float/bool bitmap at padded input resolution;
        pos_boxes: (M, 4); pos_gt_inds: (M,) index into G.

        RoIAlign is separable, so the crop is two batched matmuls
        against per-roi interpolation matrices — the XLA gather
        formulation read one sublane-padded row per bilinear tap and
        dominated the train step (~0.9 s/batch at canvas res; the
        matmul path is pure MXU work). Same adaptive-sampling
        numerics as roi_align_single (SWINDET_GATHER_MASK_TARGETS=1
        restores the old path for A/B).
        """
        import os
        if os.environ.get('SWINDET_GATHER_MASK_TARGETS'):
            rois = jnp.concatenate(
                [pos_gt_inds[:, None].astype(jnp.float32), pos_boxes],
                axis=-1)
            feats = gt_masks.astype(jnp.float32)[..., None]
            crops = roi_align_single(feats, rois, 1.0, mask_size,
                                     sampling_ratio=0)
            return (crops[..., 0] >= 0.5).astype(jnp.float32)

        from ...ops.roi_align import SR0_GMAX, adaptive_grid
        from ...ops.roi_align_pallas import _interp_matrices
        g, hh, ww = gt_masks.shape
        m = pos_boxes.shape[0]
        s = mask_size
        r = SR0_GMAX
        x1 = pos_boxes[:, 0] - 0.5
        y1 = pos_boxes[:, 1] - 0.5
        x2 = pos_boxes[:, 2] - 0.5
        y2 = pos_boxes[:, 3] - 0.5
        bin_w = (x2 - x1) / s
        bin_h = (y2 - y1) / s
        bins = jnp.arange(s, dtype=jnp.float32)
        sub_y, _, g_y = adaptive_grid(y2 - y1, s, r)
        sub_x, _, g_x = adaptive_grid(x2 - x1, s, r)
        ys = (y1[:, None, None]
              + (bins[None, None, :] + sub_y[:, :, None])
              * bin_h[:, None, None])                    # (M, r, s)
        xs = (x1[:, None, None]
              + (bins[None, None, :] + sub_x[:, :, None])
              * bin_w[:, None, None])
        slot = jnp.arange(r, dtype=jnp.float32)[None, :, None]
        ys = jnp.where((ys >= -1.0) & (ys <= hh)
                       & (slot < g_y[:, None, None]), ys, -2.0)
        xs = jnp.where((xs >= -1.0) & (xs <= ww)
                       & (slot < g_x[:, None, None]), xs, -2.0)
        hs = jnp.full((m,), hh, jnp.int32)
        wsz = jnp.full((m,), ww, jnp.int32)
        zero = jnp.zeros((m,), jnp.int32)
        ay = _interp_matrices(ys, hs, zero, hh, r, s, g_y)  # (M, s, H)
        ax = _interp_matrices(xs, wsz, zero, ww, r, s, g_x)  # (M, s, W)

        masks = jnp.take(gt_masks.astype(jnp.float32), pos_gt_inds,
                         axis=0)                          # (M, H, W)
        t = jnp.einsum('moh,mhw->mow', ay, masks,
                       precision=jax.lax.Precision.HIGHEST)
        crops = jnp.einsum('mow,mpw->mop', t, ax,
                           precision=jax.lax.Precision.HIGHEST)
        return (crops >= 0.5).astype(jnp.float32)

    # ---------------------------------------------------------------- loss
    def loss(self, mask_pred: jnp.ndarray, mask_targets: jnp.ndarray,
             labels: jnp.ndarray,
             pos_mask: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """BCE on positive RoIs' predicted-class channel
        (reference: fcn_mask_head.py:138). All flattened (B*M, ...)."""
        if self.class_agnostic:
            pred = mask_pred[..., 0]
        else:
            safe = jnp.clip(labels, 0, self.num_classes - 1)
            pred = jnp.take_along_axis(
                mask_pred, safe[:, None, None, None], axis=-1)[..., 0]
        loss = self._loss_mask(pred, mask_targets, weight=pos_mask,
                               avg_factor=jnp.maximum(jnp.sum(pos_mask), 1.))
        return dict(loss_mask=loss)

    def get_mask_probs(self, mask_pred: jnp.ndarray,
                       labels: jnp.ndarray) -> jnp.ndarray:
        """Sigmoid probs of each detection's own class channel:
        (R, s, s, C) + (R,) → (R, s, s)."""
        if self.class_agnostic:
            pred = mask_pred[..., 0]
        else:
            safe = jnp.clip(labels, 0, self.num_classes - 1)
            pred = jnp.take_along_axis(
                mask_pred, safe[:, None, None, None], axis=-1)[..., 0]
        return jax.nn.sigmoid(pred.astype(jnp.float32))
