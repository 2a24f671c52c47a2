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

    def setup(self):
        self._loss_mask = build_loss(dict(
            self.loss_mask or dict(type='CrossEntropyLoss', use_mask=True,
                                   loss_weight=1.0)))
        self.convs = [
            ConvModule(self.conv_out_channels, self.conv_kernel_size,
                       padding=self.conv_kernel_size // 2,
                       norm_cfg=self.norm_cfg, act_cfg=dict(type='ReLU'),
                       dtype=self.dtype, name=f'convs{i}')
            for i in range(self.num_convs)]
        up = self.upsample_cfg or dict(type='deconv', scale_factor=2)
        self.upsample_type = up.get('type', 'deconv')
        if self.upsample_type == 'deconv':
            self.upsample = nn.ConvTranspose(
                self.conv_out_channels, (2, 2), strides=(2, 2),
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
        return self.conv_logits(x)

    # ------------------------------------------------------------- targets
    @staticmethod
    def get_targets(gt_masks: jnp.ndarray, pos_boxes: jnp.ndarray,
                    pos_gt_inds: jnp.ndarray, mask_size: int) -> jnp.ndarray:
        """Crop+resize GT masks to (M, s, s) binary targets for one image.

        gt_masks: (G, H, W) float/bool bitmap at padded input resolution;
        pos_boxes: (M, 4); pos_gt_inds: (M,) index into G.
        """
        rois = jnp.concatenate(
            [pos_gt_inds[:, None].astype(jnp.float32), pos_boxes], axis=-1)
        feats = gt_masks.astype(jnp.float32)[..., None]   # (G, H, W, 1)
        crops = roi_align_single(feats, rois, 1.0, mask_size,
                                 sampling_ratio=0)
        return (crops[..., 0] >= 0.5).astype(jnp.float32)

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
