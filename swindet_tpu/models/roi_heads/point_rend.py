"""PointRend (reference: mmdet/models/roi_heads/point_rend_roi_head.py:13,
mask_heads/mask_point_head.py:15, mask_heads/coarse_mask_head.py:10;
arXiv:1912.08193) — coarse 14×14 mask + iterative uncertainty-guided
point refinement.

TPU-native: uncertainty-based point selection is a masked top-k over
the point logits; the train-time random/importance point mix uses the
functional sampling rng; the test-time subdivision loop is a static
python loop over `subdivision_steps` with fixed point counts; scatter
into the refined map is one `.at[].set` per step."""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS, build_loss
from ...ops.point_sample import point_sample
from .mask_heads import FCNMaskHead
from .standard_roi_head import StandardRoIHead


@HEADS.register_module()
class CoarseMaskHead(nn.Module):
    """Conv + fc mask head predicting a coarse (s, s, C) grid without
    upsampling (reference: coarse_mask_head.py:10)."""
    num_convs: int = 0
    num_fcs: int = 2
    roi_feat_size: int = 14
    downsample_factor: int = 2
    in_channels: int = 256
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    num_classes: int = 80
    class_agnostic: bool = False
    loss_mask: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        from ..layers import ConvModule
        self._loss_mask = build_loss(dict(
            self.loss_mask or dict(type='CrossEntropyLoss',
                                   use_mask=True, loss_weight=1.0)))
        self.convs = [
            ConvModule(self.conv_out_channels, 3, padding=1,
                       act_cfg=dict(type='ReLU'), dtype=self.dtype,
                       name=f'convs{i}') for i in range(self.num_convs)]
        d = self.downsample_factor
        self.downsample_conv = ConvModule(
            self.conv_out_channels, d, stride=d,
            act_cfg=dict(type='ReLU'), dtype=self.dtype,
            name='downsample_conv') if d > 1 else None
        self.fcs = [nn.Dense(self.fc_out_channels, dtype=self.dtype,
                             name=f'fcs{i}') for i in range(self.num_fcs)]
        out = 1 if self.class_agnostic else self.num_classes
        # coarse grid is the downsampled roi grid (reference :57)
        self.out_size = self.roi_feat_size // d
        self.fc_logits = nn.Dense(out * self.out_size * self.out_size,
                                  dtype=self.dtype, name='fc_logits')

    def __call__(self, x, train: bool = False):
        """(R, s, s, C) → (R, s, s, num_classes) logits."""
        r = x.shape[0]
        for conv in self.convs:
            x = conv(x, train=train)
        if self.downsample_conv is not None:
            x = self.downsample_conv(x, train=train)
        x = x.reshape(r, -1)
        for fc in self.fcs:
            x = nn.relu(fc(x))
        x = self.fc_logits(x)
        c = 1 if self.class_agnostic else self.num_classes
        # torch unflattens CHANNEL-FIRST (coarse_mask_head.py:91
        # view(r, C, s, s)) — converted fc weights carry that order
        return x.reshape(r, c, self.out_size,
                         self.out_size).transpose(0, 2, 3, 1)

    # reuse FCNMaskHead's separable target crop + BCE loss/probs
    get_targets = staticmethod(FCNMaskHead.get_targets)

    def loss(self, mask_pred, mask_targets, labels, pos_mask):
        return FCNMaskHead.loss(self, mask_pred, mask_targets, labels,
                                pos_mask)

    def get_mask_probs(self, mask_pred, labels):
        return FCNMaskHead.get_mask_probs(self, mask_pred, labels)


@HEADS.register_module()
class MaskPointHead(nn.Module):
    """Shared per-point MLP over concat(fine, coarse) features
    (reference: mask_point_head.py:15)."""
    num_classes: int = 80
    num_fcs: int = 3
    in_channels: int = 256
    fc_channels: int = 256
    class_agnostic: bool = False
    coarse_pred_each_layer: bool = True
    loss_point: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        self._loss_point = build_loss(dict(
            self.loss_point or dict(type='CrossEntropyLoss',
                                    use_mask=True, loss_weight=1.0)))
        self.fcs = [nn.Dense(self.fc_channels, dtype=self.dtype,
                             name=f'fcs{i}') for i in range(self.num_fcs)]
        out = 1 if self.class_agnostic else self.num_classes
        self.fc_logits = nn.Dense(out, dtype=self.dtype,
                                  name='fc_logits')

    def __call__(self, fine_feats, coarse_feats):
        """fine (R, P, Cf), coarse (R, P, C) → logits (R, P, C)."""
        x = jnp.concatenate([fine_feats, coarse_feats], -1)
        for fc in self.fcs:
            x = nn.relu(fc(x))
            if self.coarse_pred_each_layer:
                x = jnp.concatenate([x, coarse_feats], -1)
        return self.fc_logits(x)

    def uncertainty(self, logits, labels):
        """-|logit of the (gt/pred) class| (reference :187).
        logits (..., P, C); labels (R,)."""
        if self.class_agnostic or logits.shape[-1] == 1:
            sel = logits[..., 0]
        else:
            sel = jnp.take_along_axis(
                logits, labels[:, None, None].astype(jnp.int32),
                -1)[..., 0]
        return -jnp.abs(sel)


@HEADS.register_module()
class PointRendRoIHead(StandardRoIHead):
    point_head: Optional[dict] = None

    def setup(self):
        super().setup()
        from ..builder import build_head
        ph = dict(self.point_head or dict(type='MaskPointHead'))
        ph.setdefault('dtype', self.dtype)
        self._point_head = build_head(ph)

    def forward_dummy(self, feats, num_rois: int = 100):
        outs = super().forward_dummy(feats, num_rois)
        # touch the point head so init creates its params
        cf = sum(feats[lvl].shape[-1] for lvl in range(
            len(self._mask_extractor.featmap_strides)))
        c = (1 if self._point_head.class_agnostic
             else self._point_head.num_classes)
        fine = jnp.zeros((num_rois, 4, cf))
        coarse = jnp.zeros((num_rois, 4, c))
        return outs + (self._point_head(fine, coarse),)

    # ------------------------------------------------- fine-grained feats
    def _fine_point_feats(self, feats, boxes, rel_points):
        """Sample stride-s feature maps at roi-relative points.
        boxes (B, M, 4); rel_points (B, M, P, 2) in [0,1] → feats
        (B, M, P, C) concat over the extractor's levels."""
        b, m, p, _ = rel_points.shape
        outs = []
        for lvl, stride in enumerate(
                self._mask_extractor.featmap_strides):
            f = feats[lvl]
            h, w = f.shape[1], f.shape[2]
            x1 = boxes[..., 0:1]
            y1 = boxes[..., 1:2]
            bw = boxes[..., 2:3] - boxes[..., 0:1]
            bh = boxes[..., 3:4] - boxes[..., 1:2]
            ax = (x1[..., None] + rel_points[..., 0:1] * bw[..., None]) \
                / (stride * w)
            ay = (y1[..., None] + rel_points[..., 1:2] * bh[..., None]) \
                / (stride * h)
            pts = jnp.concatenate([ax, ay], -1).reshape(b, m * p, 2)
            outs.append(point_sample(f, pts).reshape(b, m, p, -1))
        return jnp.concatenate(outs, -1)

    # ---------------------------------------------------------------- train
    def forward_train(self, rng, feats, proposals, proposal_valid,
                      gt_bboxes, gt_valid, gt_labels, gt_masks,
                      img_shapes) -> Dict[str, jnp.ndarray]:
        point_rng, rng = jax.random.split(rng)
        losses, aux = self._forward_train_impl(
            rng, feats, proposals, proposal_valid, gt_bboxes, gt_valid,
            gt_labels, gt_masks, img_shapes, return_mask_aux=True)
        if aux is None:
            return losses
        (mask_feats, mask_pred, targets, pos_boxes, pos_inds, pos_mask,
         pos_labels) = aux
        b, m = pos_boxes.shape[:2]
        cfg = dict(self.train_cfg)
        num_points = int(cfg.get('num_points', 196))
        oversample = float(cfg.get('oversample_ratio', 3))
        imp_ratio = float(cfg.get('importance_sample_ratio', 0.75))

        flat_labels = pos_labels.reshape(-1)
        # importance sampling of uncertain points (reference :212)
        n_samp = int(num_points * oversample)
        if cfg.get('deterministic_grid_points'):
            # test seam for golden gradient parity: the reference's
            # torch.rand draw is not reproducible cross-framework, so
            # both sides use the same regular sqrt(P) x sqrt(P) grid
            # (the importance-sampling top-k that follows stays live)
            import math
            s = max(int(math.ceil(math.sqrt(n_samp))), 1)
            xs = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
            gx, gy = jnp.meshgrid(xs, xs, indexing='xy')
            grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)],
                             -1)[:n_samp]
            coords = jnp.broadcast_to(grid[None], (b * m, n_samp, 2))
        else:
            coords = jax.random.uniform(point_rng,
                                        (b * m, n_samp, 2))
        logits_at = point_sample(mask_pred, coords)          # (R,P,C)
        unc = self._point_head.uncertainty(logits_at, flat_labels)
        n_imp = int(imp_ratio * num_points)
        n_rand = num_points - n_imp
        _, top = jax.lax.top_k(unc, n_imp)
        imp_coords = jnp.take_along_axis(coords, top[..., None], 1)
        if n_rand > 0:
            rnd = jax.random.uniform(
                jax.random.fold_in(point_rng, 1), (b * m, n_rand, 2))
            coords = jnp.concatenate([imp_coords, rnd], 1)
        else:
            coords = imp_coords

        rel = coords.reshape(b, m, num_points, 2)
        fine = self._fine_point_feats(feats, pos_boxes, rel)
        coarse = point_sample(mask_pred, coords)
        point_pred = self._point_head(
            fine.reshape(b * m, num_points, -1), coarse)

        # point targets: sample gt bitmap at absolute img points
        def tgt_single(gm, boxes, inds, rp):
            masks = jnp.take(gm.astype(jnp.float32), inds,
                             axis=0)[..., None]              # (M,H,W,1)
            x1 = boxes[:, 0:1]
            y1 = boxes[:, 1:2]
            bw = boxes[:, 2:3] - boxes[:, 0:1]
            bh = boxes[:, 3:4] - boxes[:, 1:2]
            ax = (x1[:, None] + rp[..., 0:1] * bw[:, None]) \
                / gm.shape[2]
            ay = (y1[:, None] + rp[..., 1:2] * bh[:, None]) \
                / gm.shape[1]
            # pair (x_i, y_i) per point — concat along the point axis
            # would interleave x with x (caught by the grad oracle)
            pts = jnp.stack([ax[..., 0], ay[..., 0]], -1)
            # the reference keeps the CONTINUOUS bilinear sample as the
            # BCE target (mask_point_head.py _get_target_single
            # point_sample without thresholding)
            return point_sample(masks, pts)[..., 0]

        pt_targets = jax.vmap(tgt_single)(gt_masks, pos_boxes,
                                          pos_inds, rel)
        pt_targets = pt_targets.reshape(b * m, num_points)

        if self._point_head.class_agnostic:
            sel_pred = point_pred[..., 0]
        else:
            sel_pred = jnp.take_along_axis(
                point_pred, flat_labels[:, None, None].astype(jnp.int32),
                -1)[..., 0]
        p = jax.nn.log_sigmoid(sel_pred)
        q = jax.nn.log_sigmoid(-sel_pred)
        bce = -(pt_targets * p + (1 - pt_targets) * q).mean(-1)
        w = pos_mask.reshape(-1).astype(jnp.float32)
        losses['loss_point'] = jnp.sum(bce * w) / jnp.maximum(
            jnp.sum(w), 1.0)
        return losses

    # ----------------------------------------------------------------- test
    def _refine_masks(self, feats, det_boxes, det_labels, mask_pred):
        """Iterative subdivision refinement (reference :96)."""
        cfg = dict(self.test_cfg)
        steps = int(cfg.get('subdivision_steps', 5))
        num_points = int(cfg.get('subdivision_num_points', 784))
        scale = int(cfg.get('scale_factor', 2))
        b, m = det_boxes.shape[:2]
        flat_labels = det_labels.reshape(-1)
        refined = mask_pred                                  # (R,s,s,C)
        for _ in range(steps):
            r, hh, ww, c = refined.shape
            refined = jax.image.resize(
                refined, (r, hh * scale, ww * scale, c), 'bilinear')
            hh, ww = hh * scale, ww * scale
            if num_points >= hh * ww:
                continue
            unc_map = self._point_head.uncertainty(
                refined.reshape(r, hh * ww, c), flat_labels)
            _, idx = jax.lax.top_k(unc_map, num_points)      # (R,P)
            px = (idx % ww).astype(jnp.float32)
            py = (idx // ww).astype(jnp.float32)
            coords = jnp.stack([(px + 0.5) / ww, (py + 0.5) / hh], -1)
            rel = coords.reshape(b, m, num_points, 2)
            fine = self._fine_point_feats(feats, det_boxes, rel)
            coarse = point_sample(mask_pred, coords)
            pt = self._point_head(
                fine.reshape(r, num_points, -1), coarse)     # (R,P,C)
            flat = refined.reshape(r, hh * ww, c)
            flat = jax.vmap(lambda f, i, v: f.at[i].set(v))(
                flat, idx, pt)
            refined = flat.reshape(r, hh, ww, c)
        return refined

    def simple_test(self, feats, proposals, proposal_valid, img_shapes,
                    scale_factors, rescale: bool = True):
        out = super().simple_test(feats, proposals, proposal_valid,
                                  img_shapes, scale_factors,
                                  rescale=rescale)
        if not self.with_mask:
            return out
        b = proposals.shape[0]
        det_boxes = out['dets'][..., :4]
        if rescale:
            det_boxes = det_boxes * scale_factors[:, None, :4]
        m = det_boxes.shape[1]
        mask_rois = jnp.concatenate(
            [jnp.repeat(np.arange(b, dtype=np.float32), m)[:, None],
             det_boxes.reshape(-1, 4)], axis=-1)
        mask_pred = self._mask_head(self._mask_extractor(feats,
                                                         mask_rois))
        refined = self._refine_masks(feats, det_boxes, out['labels'],
                                     mask_pred)
        probs = self._mask_head.get_mask_probs(
            refined, out['labels'].reshape(-1))
        out['mask_probs'] = probs.reshape(
            b, m, probs.shape[1], probs.shape[2])
        return out
