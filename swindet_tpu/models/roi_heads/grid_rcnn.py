"""Grid R-CNN (reference: mmdet/models/roi_heads/grid_roi_head.py:12,
mask_heads/grid_head.py:9; arXiv:1811.12030 / Plus 1906.05688) —
classification-only bbox head; localization comes from a 9-point grid
heatmap head with first/second-order neighbor fusion and boundary
voting at decode.

TPU-native notes:
- The per-(roi, point) circle-painting target loop becomes a broadcast
  distance test directly on each point's half-size sub-region.
- Grouped deconvs (groups=grid_points) are per-point ConvTranspose
  slices (9 small ops — flax has no grouped transpose conv).
- Train-time grid sampling uses fixed ``max_num_grid`` slots with
  validity masks; proposal jitter uses the functional sampling rng."""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS, build_loss
from ..layers import ConvModule
from .standard_roi_head import StandardRoIHead


@HEADS.register_module()
class GridHead(nn.Module):
    grid_points: int = 9
    num_convs: int = 8
    roi_feat_size: int = 14
    in_channels: int = 256
    conv_kernel_size: int = 3
    point_feat_channels: int = 64
    deconv_kernel_size: int = 4
    class_agnostic: bool = False
    loss_grid: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @property
    def grid_size(self):
        return int(np.sqrt(self.grid_points))

    @property
    def whole_map_size(self):
        return self.roi_feat_size * 4

    def _neighbors(self):
        gs = self.grid_size
        out = []
        for i in range(gs):
            for j in range(gs):
                nb = []
                if i > 0:
                    nb.append((i - 1) * gs + j)
                if j > 0:
                    nb.append(i * gs + j - 1)
                if j < gs - 1:
                    nb.append(i * gs + j + 1)
                if i < gs - 1:
                    nb.append((i + 1) * gs + j)
                out.append(tuple(nb))
        return out

    def sub_regions(self):
        """(reference :189 calc_sub_regions)."""
        half = self.whole_map_size // 4 * 2
        out = []
        gs = self.grid_size
        for i in range(self.grid_points):
            xi, yi = i // gs, i % gs
            if xi == 0:
                sx = 0
            elif xi == gs - 1:
                sx = half
            else:
                sx = max(int((xi / (gs - 1) - 0.25) *
                             self.whole_map_size), 0)
            if yi == 0:
                sy = 0
            elif yi == gs - 1:
                sy = half
            else:
                sy = max(int((yi / (gs - 1) - 0.25) *
                             self.whole_map_size), 0)
            out.append((sx, sy, sx + half, sy + half))
        return out

    def setup(self):
        self._loss_grid = build_loss(dict(
            self.loss_grid or dict(type='CrossEntropyLoss',
                                   use_sigmoid=True, loss_weight=15)))
        c_out = self.point_feat_channels * self.grid_points
        norm = self.norm_cfg or dict(type='GN', num_groups=36)
        self.convs = [
            ConvModule(c_out, self.conv_kernel_size,
                       stride=2 if i == 0 else 1,
                       padding=(self.conv_kernel_size - 1) // 2,
                       norm_cfg=norm, act_cfg=dict(type='ReLU'),
                       bias=True, dtype=self.dtype, name=f'convs{i}')
            for i in range(self.num_convs)]
        nbrs = self._neighbors()
        self.forder = [[
            (nn.Conv(self.point_feat_channels, (5, 5),
                     padding=[(2, 2)] * 2,
                     feature_group_count=self.point_feat_channels,
                     dtype=self.dtype, name=f'fo_dw_{i}_{j}'),
             nn.Conv(self.point_feat_channels, (1, 1), dtype=self.dtype,
                     name=f'fo_pw_{i}_{j}'))
            for j in range(len(nbrs[i]))] for i in range(self.grid_points)]
        self.sorder = [[
            (nn.Conv(self.point_feat_channels, (5, 5),
                     padding=[(2, 2)] * 2,
                     feature_group_count=self.point_feat_channels,
                     dtype=self.dtype, name=f'so_dw_{i}_{j}'),
             nn.Conv(self.point_feat_channels, (1, 1), dtype=self.dtype,
                     name=f'so_pw_{i}_{j}'))
            for j in range(len(nbrs[i]))] for i in range(self.grid_points)]
        k = self.deconv_kernel_size
        # torch ConvTranspose2d(k=4, s=2, p=1) == flax 'SAME' (2x up)
        self.deconv1 = [
            nn.ConvTranspose(self.point_feat_channels, (k, k),
                             strides=(2, 2), padding='SAME',
                             dtype=self.dtype, name=f'deconv1_{i}')
            for i in range(self.grid_points)]
        self.deconv2 = [
            nn.ConvTranspose(1, (k, k), strides=(2, 2), padding='SAME',
                             dtype=self.dtype,
                             bias_init=nn.initializers.constant(
                                 -float(np.log(0.99 / 0.01))),
                             name=f'deconv2_{i}')
            for i in range(self.grid_points)]
        self.norm1 = nn.GroupNorm(num_groups=self.grid_points,
                                  name='norm1')

    def _heatmap(self, parts, train):
        """parts: list of (R, h, w, c) per grid point → (R, H, W, G)."""
        x = jnp.concatenate(
            [self.deconv1[i](p) for i, p in enumerate(parts)], -1)
        x = nn.relu(self.norm1(x.astype(jnp.float32)).astype(x.dtype))
        c = self.point_feat_channels
        return jnp.concatenate(
            [self.deconv2[i](x[..., i * c:(i + 1) * c])
             for i in range(self.grid_points)], -1)

    def __call__(self, x, train: bool = False):
        """(R, 14, 14, C) → dict(fused/unfused (R, 28, 28, G))."""
        for conv in self.convs:
            x = conv(x, train=train)
        c = self.point_feat_channels
        nbrs = self._neighbors()
        parts = [x[..., i * c:(i + 1) * c]
                 for i in range(self.grid_points)]
        fo = []
        for i, points in enumerate(nbrs):
            acc = parts[i]
            for j, pt in enumerate(points):
                dw, pw = self.forder[i][j]
                acc = acc + pw(dw(parts[pt]))
            fo.append(acc)
        so = []
        for i, points in enumerate(nbrs):
            acc = parts[i]
            for j, pt in enumerate(points):
                dw, pw = self.sorder[i][j]
                acc = acc + pw(dw(fo[pt]))
            so.append(acc)
        fused = self._heatmap(so, train)
        unfused = self._heatmap(parts, train) if train else fused
        return dict(fused=fused, unfused=unfused)

    # ----------------------------------------------------------- targets
    def get_targets(self, pos_boxes, pos_gt_boxes, pos_radius: int):
        """(M, 4) × (M, 4) → (M, half, half, G) sub-region circle
        targets (reference :220); invalid/small boxes produce zeros."""
        half = self.whole_map_size // 4 * 2
        gs = self.grid_size
        wm = self.whole_map_size
        # expand proposals 2x
        w = pos_boxes[:, 2] - pos_boxes[:, 0]
        h = pos_boxes[:, 3] - pos_boxes[:, 1]
        x1 = pos_boxes[:, 0] - w / 2
        y1 = pos_boxes[:, 1] - h / 2
        ew = 2 * w
        eh = 2 * h
        ok = (ew > gs) & (eh > gs)
        subs = self.sub_regions()
        r2 = float(pos_radius) ** 2
        tgts = []
        ys = jnp.arange(half, dtype=jnp.float32)
        xs = jnp.arange(half, dtype=jnp.float32)
        for j in range(self.grid_points):
            fx = 1 - (j // gs) / (gs - 1)
            fy = 1 - (j % gs) / (gs - 1)
            gx = fx * pos_gt_boxes[:, 0] + (1 - fx) * pos_gt_boxes[:, 2]
            gy = fy * pos_gt_boxes[:, 1] + (1 - fy) * pos_gt_boxes[:, 3]
            cx = jnp.floor((gx - x1) / jnp.maximum(ew, 1e-6) * wm)
            cy = jnp.floor((gy - y1) / jnp.maximum(eh, 1e-6) * wm)
            sx, sy = subs[j][0], subs[j][1]
            dx = xs[None, None, :] + sx - cx[:, None, None]
            dy = ys[None, :, None] + sy - cy[:, None, None]
            t = ((dx * dx + dy * dy) <= r2) & ok[:, None, None]
            tgts.append(t.astype(jnp.float32))
        return jnp.stack(tgts, -1)

    def loss(self, grid_pred, grid_targets, weight):
        """BCE over fused + unfused maps; weight (M,) masks invalid."""
        def bce(pred):
            p = pred.astype(jnp.float32)
            l = jnp.maximum(p, 0) - p * grid_targets + \
                jnp.log1p(jnp.exp(-jnp.abs(p)))
            l = l.mean(axis=(1, 2, 3))
            return jnp.sum(l * weight) / jnp.maximum(jnp.sum(weight), 1.0)
        w = self._loss_grid.loss_weight
        return dict(loss_grid=w * (bce(grid_pred['fused'])
                                   + bce(grid_pred['unfused'])))

    # ------------------------------------------------------------ decode
    def get_bboxes(self, det_bboxes, grid_pred, img_shape):
        """Boundary voting decode (reference :294). det_bboxes (M, 5);
        grid_pred (M, half, half, G) logits."""
        m, hh, ww, g = grid_pred.shape
        gs = self.grid_size
        pred = jax.nn.sigmoid(
            grid_pred.astype(jnp.float32)).transpose(0, 3, 1, 2)
        flat = pred.reshape(m, g, hh * ww)
        scores = flat.max(-1)
        pos = flat.argmax(-1)
        xs = (pos % ww).astype(jnp.float32)
        ys = (pos // ww).astype(jnp.float32)
        subs = self.sub_regions()
        sx = jnp.asarray([s[0] for s in subs], jnp.float32)[None]
        sy = jnp.asarray([s[1] for s in subs], jnp.float32)[None]
        xs = xs + sx
        ys = ys + sy
        w = (det_bboxes[:, 2] - det_bboxes[:, 0])[:, None]
        h = (det_bboxes[:, 3] - det_bboxes[:, 1])[:, None]
        x1 = det_bboxes[:, 0][:, None] - w / 2
        y1 = det_bboxes[:, 1][:, None] - h / 2
        # NOTE reference maps (x+0.5)/w with w = half map size
        abs_x = (xs + 0.5) / (2 * ww) * (2 * w) + x1
        abs_y = (ys + 0.5) / (2 * hh) * (2 * h) + y1
        x1i = [i for i in range(gs)]
        y1i = [i * gs for i in range(gs)]
        x2i = [g - gs + i for i in range(gs)]
        y2i = [(i + 1) * gs - 1 for i in range(gs)]

        def vote(vals, sc, ids):
            v = vals[:, ids]
            s = sc[:, ids]
            return (v * s).sum(-1) / jnp.maximum(s.sum(-1), 1e-6)

        bx1 = jnp.clip(vote(abs_x, scores, x1i), 0,
                       img_shape[1].astype(jnp.float32))
        by1 = jnp.clip(vote(abs_y, scores, y1i), 0,
                       img_shape[0].astype(jnp.float32))
        bx2 = jnp.clip(vote(abs_x, scores, x2i), 0,
                       img_shape[1].astype(jnp.float32))
        by2 = jnp.clip(vote(abs_y, scores, y2i), 0,
                       img_shape[0].astype(jnp.float32))
        return jnp.stack([bx1, by1, bx2, by2], -1)


@HEADS.register_module()
class GridRoIHead(StandardRoIHead):
    grid_roi_extractor: Optional[dict] = None
    grid_head: Optional[dict] = None

    def setup(self):
        super().setup()
        from ..builder import build_head, build_roi_extractor
        ge = dict(self.grid_roi_extractor or self.bbox_roi_extractor)
        ge.setdefault('dtype', self.dtype)
        self._grid_extractor = build_roi_extractor(ge)
        gh = dict(self.grid_head or dict(type='GridHead'))
        gh.setdefault('dtype', self.dtype)
        self._grid_head = build_head(gh)

    def forward_dummy(self, feats, num_rois: int = 100):
        outs = super().forward_dummy(feats, num_rois)
        s = self._grid_head.roi_feat_size
        dummy = jnp.zeros(
            (4, s, s, self._grid_head.in_channels), jnp.float32)
        return outs + (self._grid_head(dummy, train=True),)

    def forward_train(self, rng, feats, proposals, proposal_valid,
                      gt_bboxes, gt_valid, gt_labels, gt_masks,
                      img_shapes) -> Dict[str, jnp.ndarray]:
        jitter_rng, sel_rng, rng = jax.random.split(rng, 3)
        losses, _ = self._forward_train_impl(
            rng, feats, proposals, proposal_valid, gt_bboxes, gt_valid,
            gt_labels, gt_masks, img_shapes)

        # re-run assignment deterministically? No — reuse sampler slots:
        # the bbox pass above consumed `rng`; do an independent pos-set
        # for the grid branch with its own rng (random sampling either
        # way, matching the reference's shared sampling in expectation)
        b, p = proposals.shape[:2]

        def assign_pos(r, props, pvalid, gb, gv, gl, ish):
            assign = self._assigner.assign(props, gb, gv, gl,
                                           bbox_valid=pvalid)
            samp = self._sampler.sample(r, assign, props, gb, gv, gl,
                                        bbox_valid=pvalid)
            m = int(self._sampler.num * self._sampler.pos_fraction)
            boxes = samp.bboxes[:m]
            pos = samp.is_pos[:m]
            gtb = samp.pos_gt_bboxes[:m]
            # random jitter (reference _random_jitter, amplitude 0.15;
            # configurable so the golden gradient-parity test can set 0
            # to remove the only cross-framework RNG coupling)
            amp = float(dict(self.train_cfg).get('jitter_amplitude',
                                                 0.15))
            off = jax.random.uniform(r, (m, 4), minval=-amp,
                                     maxval=amp)
            cxcy = (boxes[:, 2:] + boxes[:, :2]) / 2
            wh = jnp.abs(boxes[:, 2:] - boxes[:, :2])
            ncxcy = cxcy + wh * off[:, :2]
            nwh = wh * (1 + off[:, 2:])
            jb = jnp.concatenate([ncxcy - nwh / 2, ncxcy + nwh / 2], -1)
            hw = ish.astype(jnp.float32)
            jb = jnp.clip(jb, 0, jnp.stack(
                [hw[1] - 1, hw[0] - 1, hw[1] - 1, hw[0] - 1])[None])
            return jb, gtb, pos

        rngs = jax.random.split(jitter_rng, b)
        jboxes, gtb, pos = jax.vmap(assign_pos)(
            rngs, proposals, proposal_valid, gt_bboxes, gt_valid,
            gt_labels, img_shapes)
        m = jboxes.shape[1]
        max_grid = int(dict(self.train_cfg).get('max_num_grid', 192))
        k = min(max_grid, b * m)
        keys = jax.random.uniform(sel_rng, (b * m,))
        sel_score = jnp.where(pos.reshape(-1), keys, -1.0)
        _, sel = jax.lax.top_k(sel_score, k)
        sel_valid = jnp.take(pos.reshape(-1), sel)
        batch_col = jnp.repeat(jnp.arange(b, dtype=jnp.float32), m)
        rois = jnp.concatenate(
            [batch_col[:, None], jboxes.reshape(-1, 4)], -1)[sel]
        grid_feats = self._grid_extractor(feats, rois)
        grid_pred = self._grid_head(grid_feats, train=True)
        tgts = self._grid_head.get_targets(
            rois[:, 1:], gtb.reshape(-1, 4)[sel],
            int(dict(self.train_cfg).get('pos_radius', 1)))
        losses.update(self._grid_head.loss(
            grid_pred, tgts, sel_valid.astype(jnp.float32)))
        return losses

    def simple_test(self, feats, proposals, proposal_valid, img_shapes,
                    scale_factors, rescale: bool = True):
        out = super().simple_test(feats, proposals, proposal_valid,
                                  img_shapes, scale_factors,
                                  rescale=False)
        b, m = out['dets'].shape[:2]
        det_boxes = out['dets'][..., :4]
        batch_col = jnp.repeat(jnp.arange(b, dtype=jnp.float32), m)
        rois = jnp.concatenate(
            [batch_col[:, None], det_boxes.reshape(-1, 4)], -1)
        grid_feats = self._grid_extractor(feats, rois)
        grid_pred = self._grid_head(grid_feats)['fused']
        refined = jax.vmap(
            lambda d, g, ish: self._grid_head.get_bboxes(d, g, ish))(
            out['dets'].reshape(b, m, 5),
            grid_pred.reshape(b, m, *grid_pred.shape[1:]), img_shapes)
        if rescale:
            refined = refined / scale_factors[:, None, :4]
        out['dets'] = jnp.concatenate([refined, out['dets'][..., 4:]],
                                      -1)
        return out
