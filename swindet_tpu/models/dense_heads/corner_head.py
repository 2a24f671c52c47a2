"""CornerHead — CornerNet paired-keypoint detection (reference:
mmdet/models/dense_heads/corner_head.py:77; arXiv:1808.01244) and
CentripetalHead (centripetal_head.py:12; arXiv:2003.09119).

TPU-native re-design:
- CornerPool = lax.cummax scans (ops/corner_pool.py), no CUDA kernel.
- Gaussian-target painting: the reference's per-gt python loop becomes
  a broadcast (B, G, H, W) max-reduction with per-gt dynamic radii
  (window mask + gaussian; the reference's eps-floor on tiny gaussian
  values is below fp32 resolution of the loss and omitted).
- Decode is a vmapped fixed-shape pipeline: 3×3 local-max, top-k
  corners, k×k pair matrix, mask-and-topk — identical candidate set.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..builder import HEADS, build_loss
from ..layers import ConvModule, bias_prob_init, normal_init
from ...core.nms import batched_nms, fast_topk, soft_nms
from ...ops.corner_pool import corner_pool


def gaussian_radius(det_hw, min_overlap):
    """(reference: models/utils/gaussian_target.py:66) — three-case
    quadratic bound; vectorized over gts."""
    h, w = det_hw
    a1 = 1.0
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0.0))
    r1 = (b1 - sq1) / (2 * a1)

    a2 = 4.0
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    sq2 = jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))
    r2 = (b2 - sq2) / (2 * a2)

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    sq3 = jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


class BiCornerPool(nn.Module):
    """(reference: corner_head.py:16)."""
    out_channels: int
    directions: Tuple[str, str]
    feat_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = dict(type='BN')
        d1 = ConvModule(self.feat_channels, 3, padding=1, norm_cfg=bn,
                        act_cfg=dict(type='ReLU'), dtype=self.dtype,
                        name='direction1_conv')(x, train)
        d2 = ConvModule(self.feat_channels, 3, padding=1, norm_cfg=bn,
                        act_cfg=dict(type='ReLU'), dtype=self.dtype,
                        name='direction2_conv')(x, train)
        p = (corner_pool(d1, self.directions[0]) +
             corner_pool(d2, self.directions[1]))
        after = ConvModule(self.out_channels, 3, padding=1, norm_cfg=bn,
                           act_cfg=None, dtype=self.dtype,
                           name='aftpool_conv')(p, train)
        c1 = ConvModule(self.out_channels, 1, norm_cfg=bn, act_cfg=None,
                        dtype=self.dtype, name='conv1')(x, train)
        out = nn.relu(after + c1)
        return ConvModule(self.out_channels, 3, padding=1, norm_cfg=bn,
                          act_cfg=dict(type='ReLU'), dtype=self.dtype,
                          name='conv2')(out, train)


class _Branch(nn.Module):
    """3×3 ConvModule (no norm) + 1×1 prediction conv
    (reference: corner_head.py:144 _make_layers)."""
    out_channels: int
    feat_channels: int = 256
    bias_prob: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvModule(self.feat_channels, 3, padding=1,
                       act_cfg=dict(type='ReLU'), dtype=self.dtype,
                       name='conv0')(x, train)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       bias_init=(bias_prob_init(self.bias_prob)
                                  if self.bias_prob else
                                  nn.initializers.zeros),
                       name='out')(x)


@HEADS.register_module()
class CornerHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    num_feat_levels: int = 2
    corner_emb_channels: int = 1
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    loss_heatmap: Optional[dict] = None
    loss_embedding: Optional[dict] = None
    loss_offset: Optional[dict] = None
    dtype: Any = jnp.float32

    @property
    def with_corner_emb(self):
        return self.corner_emb_channels > 0

    def setup(self):
        self._loss_heatmap = build_loss(dict(
            self.loss_heatmap or dict(type='GaussianFocalLoss', alpha=2.0,
                                      gamma=4.0, loss_weight=1.0)))
        self._loss_embedding = build_loss(dict(
            self.loss_embedding or dict(type='AssociativeEmbeddingLoss',
                                        pull_weight=0.25,
                                        push_weight=0.25))) \
            if self.with_corner_emb else None
        self._loss_offset = build_loss(dict(
            self.loss_offset or dict(type='SmoothL1Loss', beta=1.0,
                                     loss_weight=1.0)))
        self.tl_pools = [BiCornerPool(self.in_channels, ('top', 'left'),
                                      dtype=self.dtype,
                                      name=f'tl_pool{i}')
                         for i in range(self.num_feat_levels)]
        self.br_pools = [BiCornerPool(self.in_channels,
                                      ('bottom', 'right'),
                                      dtype=self.dtype,
                                      name=f'br_pool{i}')
                         for i in range(self.num_feat_levels)]

        def branches(prefix, out_ch, bias_prob=None):
            return [_Branch(out_ch, bias_prob=bias_prob,
                            dtype=self.dtype, name=f'{prefix}{i}')
                    for i in range(self.num_feat_levels)]
        # heatmap bias at prior 0.1 (reference init_weights :216)
        self.tl_heat = branches('tl_heat', self.num_classes, 0.1)
        self.br_heat = branches('br_heat', self.num_classes, 0.1)
        if self.with_corner_emb:
            self.tl_emb = branches('tl_emb', self.corner_emb_channels)
            self.br_emb = branches('br_emb', self.corner_emb_channels)
        self.tl_off = branches('tl_off', 2)
        self.br_off = branches('br_off', 2)

    def forward_single(self, x, lvl, train: bool = False,
                       return_pool: bool = False):
        tl = self.tl_pools[lvl](x, train)
        br = self.br_pools[lvl](x, train)
        tl_heat = self.tl_heat[lvl](tl, train)
        br_heat = self.br_heat[lvl](br, train)
        tl_emb = (self.tl_emb[lvl](tl, train) if self.with_corner_emb
                  else None)
        br_emb = (self.br_emb[lvl](br, train) if self.with_corner_emb
                  else None)
        tl_off = self.tl_off[lvl](tl, train)
        br_off = self.br_off[lvl](br, train)
        if return_pool:
            return (tl_heat, br_heat, tl_emb, br_emb, tl_off, br_off,
                    tl, br)
        return tl_heat, br_heat, tl_emb, br_emb, tl_off, br_off

    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        return tuple(zip(*[self.forward_single(f, i, train)
                           for i, f in enumerate(feats)]))

    # ----------------------------------------------------------- targets
    def get_targets(self, gt_bboxes, gt_valid, gt_labels, feat_hw,
                    img_hw):
        """Vectorized corner targets (reference :310). gt_bboxes
        (B, G, 4); img_hw (B, 2) padded canvas."""
        b, g = gt_bboxes.shape[:2]
        h, w = feat_hw
        wr = w / img_hw[:, 1].astype(jnp.float32)       # (B,)
        hr = h / img_hw[:, 0].astype(jnp.float32)
        sl = gt_bboxes[..., 0] * wr[:, None]
        st = gt_bboxes[..., 1] * hr[:, None]
        sr = gt_bboxes[..., 2] * wr[:, None]
        sb = gt_bboxes[..., 3] * hr[:, None]
        li = jnp.minimum(sl, w - 1).astype(jnp.int32)
        ri = jnp.minimum(sr, w - 1).astype(jnp.int32)
        ti = jnp.minimum(st, h - 1).astype(jnp.int32)
        bi = jnp.minimum(sb, h - 1).astype(jnp.int32)
        radius = jnp.maximum(jnp.floor(gaussian_radius(
            (jnp.ceil(sb - st), jnp.ceil(sr - sl)),
            min_overlap=0.3)), 0.0)                      # (B, G)

        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)

        def heat(cy, cx):
            """(B, G) centers → (B, H, W, C) class max-gaussian."""
            dy = ys[None, None, :] - cy[..., None].astype(jnp.float32)
            dx = xs[None, None, :] - cx[..., None].astype(jnp.float32)
            sigma = (2 * radius + 1) / 6.0
            gy = jnp.exp(-dy ** 2 / (2 * sigma[..., None] ** 2))
            gx = jnp.exp(-dx ** 2 / (2 * sigma[..., None] ** 2))
            my = (jnp.abs(dy) <= radius[..., None]) & gt_valid[..., None]
            mx = jnp.abs(dx) <= radius[..., None]
            gz = (jnp.where(my, gy, 0.0)[:, :, :, None] *
                  jnp.where(mx, gx, 0.0)[:, :, None, :])   # (B,G,H,W)
            # scatter-max per class channel (avoids a (B,G,H,W,C)
            # broadcast); invalid gts routed to a dropped index
            bi_ = jnp.broadcast_to(jnp.arange(b)[:, None], (b, g))
            lab = jnp.where(gt_valid, gt_labels, -1)
            out = jnp.zeros((b, self.num_classes, h, w), jnp.float32)
            out = out.at[bi_, lab].max(gz, mode='drop')
            return out.transpose(0, 2, 3, 1)

        tl_heat = heat(ti, li)
        br_heat = heat(bi, ri)

        def offsets(cy, cx, off_y, off_x):
            out = jnp.zeros((b, h, w, 2), jnp.float32)
            bi_ = jnp.broadcast_to(jnp.arange(b)[:, None], (b, g))
            cy = jnp.where(gt_valid, cy, -1)             # drop invalid
            vals = jnp.stack([off_x, off_y], -1)
            return out.at[bi_, cy, cx].set(vals, mode='drop')

        tl_off = offsets(ti, li, st - ti, sl - li)
        br_off = offsets(bi, ri, sb - bi, sr - ri)
        out = dict(tl_heat=tl_heat, br_heat=br_heat, tl_off=tl_off,
                   br_off=br_off, tl_pos=(ti, li), br_pos=(bi, ri))
        scx = (sl + sr) / 2.0
        scy = (st + sb) / 2.0
        if getattr(self, 'with_guiding_shift', False):
            out['tl_guiding'] = offsets(ti, li, scy - ti, scx - li)
            out['br_guiding'] = offsets(bi, ri, bi - scy, ri - scx)
        if getattr(self, 'with_centripetal_shift', False):
            eps = 1e-6  # padded/degenerate gts are masked by heat==1
            out['tl_centripetal'] = offsets(
                ti, li, jnp.log(jnp.maximum(scy - st, eps)),
                jnp.log(jnp.maximum(scx - sl, eps)))
            out['br_centripetal'] = offsets(
                bi, ri, jnp.log(jnp.maximum(sb - scy, eps)),
                jnp.log(jnp.maximum(sr - scx, eps)))
        return out

    # -------------------------------------------------------------- loss
    def loss(self, rng, tl_heats, br_heats, tl_embs, br_embs, tl_offs,
             br_offs, gt_bboxes, gt_valid, gt_labels, img_shapes,
             pad_shapes) -> Dict[str, jnp.ndarray]:
        feat_hw = (tl_heats[-1].shape[1], tl_heats[-1].shape[2])
        t = self.get_targets(gt_bboxes, gt_valid, gt_labels, feat_hw,
                             pad_shapes)
        det_loss = 0.0
        pull_loss = 0.0
        push_loss = 0.0
        off_loss = 0.0
        b, g = gt_bboxes.shape[:2]
        bi_ = jnp.broadcast_to(jnp.arange(b)[:, None], (b, g))
        tl_mask = (jnp.max(t['tl_heat'], -1) == 1.0)[..., None]
        br_mask = (jnp.max(t['br_heat'], -1) == 1.0)[..., None]
        for lvl in range(len(tl_heats)):
            hp = jax.nn.sigmoid(tl_heats[lvl].astype(jnp.float32))
            det_l = self._loss_heatmap(
                hp, t['tl_heat'],
                avg_factor=jnp.maximum(jnp.sum(t['tl_heat'] == 1.0), 1))
            hp = jax.nn.sigmoid(br_heats[lvl].astype(jnp.float32))
            det_l = det_l + self._loss_heatmap(
                hp, t['br_heat'],
                avg_factor=jnp.maximum(jnp.sum(t['br_heat'] == 1.0), 1))
            det_loss = det_loss + det_l / 2.0

            if self.with_corner_emb:
                ty, tx = t['tl_pos']
                by, bx = t['br_pos']
                tl_e = tl_embs[lvl].astype(jnp.float32)[bi_, ty, tx]
                br_e = br_embs[lvl].astype(jnp.float32)[bi_, by, bx]
                pl, ps = self._loss_embedding(tl_e, br_e, gt_valid)
                pull_loss = pull_loss + pl
                push_loss = push_loss + ps

            ol = self._loss_offset(
                tl_offs[lvl].astype(jnp.float32), t['tl_off'],
                weight=jnp.broadcast_to(tl_mask,
                                        t['tl_off'].shape).astype(
                    jnp.float32),
                avg_factor=jnp.maximum(jnp.sum(tl_mask), 1))
            ol = ol + self._loss_offset(
                br_offs[lvl].astype(jnp.float32), t['br_off'],
                weight=jnp.broadcast_to(br_mask,
                                        t['br_off'].shape).astype(
                    jnp.float32),
                avg_factor=jnp.maximum(jnp.sum(br_mask), 1))
            off_loss = off_loss + ol / 2.0
        out = dict(det_loss=det_loss, off_loss=off_loss)
        if self.with_corner_emb:
            out.update(pull_loss=pull_loss, push_loss=push_loss)
        return out

    # ------------------------------------------------------------ decode
    def _local_max(self, heat, kernel=3):
        pad = (kernel - 1) // 2
        hmax = jax.lax.reduce_window(
            heat, -jnp.inf, jax.lax.max, (1, kernel, kernel, 1),
            (1, 1, 1, 1),
            ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        return jnp.where(hmax == heat, heat, 0.0)

    def decode_heatmap(self, tl_heat, br_heat, tl_off, br_off, tl_emb,
                       br_emb, img_hw, k=100, kernel=3,
                       distance_threshold=0.5, num_dets=1000,
                       tl_centripetal=None, br_centripetal=None):
        """Per-image (reference :864). All inputs single-image NHWC.
        Either embeddings or centripetal shifts select corner pairs.
        The reference's ``border`` un-cropping is a no-op here: our test
        pipeline right-bottom-pads (border 0) instead of center-padding.
        """
        h, w = tl_heat.shape[0], tl_heat.shape[1]
        inp_h = img_hw[0].astype(jnp.float32)
        inp_w = img_hw[1].astype(jnp.float32)

        def topk(heat):
            flat = heat.transpose(2, 0, 1).reshape(-1)  # class-major
            scores, inds = fast_topk(flat, k)
            cls = inds // (h * w)
            pos = inds % (h * w)
            return scores, pos, cls, (pos // w).astype(jnp.float32), \
                (pos % w).astype(jnp.float32)

        tl_s, tl_i, tl_c, tl_y, tl_x = topk(self._local_max(
            tl_heat[None], kernel)[0])
        br_s, br_i, br_c, br_y, br_x = topk(self._local_max(
            br_heat[None], kernel)[0])

        def gather(m, pos):
            return m.reshape(-1, m.shape[-1])[pos]

        tl_o = gather(tl_off, tl_i)                     # (k, 2) (x, y)
        br_o = gather(br_off, br_i)
        tl_xs = (tl_x + tl_o[:, 0])[:, None]            # (k, 1)
        tl_ys = (tl_y + tl_o[:, 1])[:, None]
        br_xs = (br_x + br_o[:, 0])[None, :]            # (1, k)
        br_ys = (br_y + br_o[:, 1])[None, :]

        tl_xs = tl_xs * (inp_w / w)
        tl_ys = tl_ys * (inp_h / h)
        br_xs = br_xs * (inp_w / w)
        br_ys = br_ys * (inp_h / h)
        tl_xs = jnp.maximum(tl_xs, 0.0)
        tl_ys = jnp.maximum(tl_ys, 0.0)
        br_xs = jnp.maximum(br_xs, 0.0)
        br_ys = jnp.maximum(br_ys, 0.0)

        boxes = jnp.stack([
            jnp.broadcast_to(tl_xs, (k, k)),
            jnp.broadcast_to(tl_ys, (k, k)),
            jnp.broadcast_to(br_xs, (k, k)),
            jnp.broadcast_to(br_ys, (k, k))], -1)       # (k, k, 4)

        if tl_emb is not None:
            tl_e = gather(tl_emb, tl_i)[:, None, :]     # (k, 1, M)
            br_e = gather(br_emb, br_i)[None, :, :]
            dists = jnp.abs(tl_e - br_e).mean(-1)       # (k, k)
            ct_bad = jnp.zeros((k, k), bool)
        else:
            # centripetal pairing (reference centripetal_head + :948):
            # exp shifts move corners toward the center; a valid pair's
            # shifted points must land inside the central region.
            tl_cs = jnp.exp(gather(tl_centripetal, tl_i))   # (k, 2) x,y
            br_cs = jnp.exp(gather(br_centripetal, br_i))
            tl_ctx = (tl_xs + tl_cs[:, 0:1] * (inp_w / w))
            tl_cty = (tl_ys + tl_cs[:, 1:2] * (inp_h / h))
            br_ctx = (br_xs - br_cs[None, :, 0] * (inp_w / w))
            br_cty = (br_ys - br_cs[None, :, 1] * (inp_h / h))
            tl_ctx = jnp.broadcast_to(jnp.maximum(tl_ctx, 0.0), (k, k))
            tl_cty = jnp.broadcast_to(jnp.maximum(tl_cty, 0.0), (k, k))
            br_ctx = jnp.broadcast_to(jnp.maximum(br_ctx, 0.0), (k, k))
            br_cty = jnp.broadcast_to(jnp.maximum(br_cty, 0.0), (k, k))
            area = jnp.abs((boxes[..., 2] - boxes[..., 0]) *
                           (boxes[..., 3] - boxes[..., 1]))
            area_ct = jnp.abs((br_ctx - tl_ctx) * (br_cty - tl_cty))
            mu = jnp.where(area > 3500, 1 / 2.1, 1 / 2.4)
            cx = (boxes[..., 0] + boxes[..., 2]) / 2
            cy = (boxes[..., 1] + boxes[..., 3]) / 2
            rx1 = cx - mu * (boxes[..., 2] - boxes[..., 0]) / 2
            ry1 = cy - mu * (boxes[..., 3] - boxes[..., 1]) / 2
            rx2 = cx + mu * (boxes[..., 2] - boxes[..., 0]) / 2
            ry2 = cy + mu * (boxes[..., 3] - boxes[..., 1]) / 2
            area_r = jnp.abs((rx2 - rx1) * (ry2 - ry1))
            dists = area_ct / jnp.maximum(area_r, 1e-6)
            ct_bad = ((tl_ctx <= rx1) | (tl_ctx >= rx2) |
                      (tl_cty <= ry1) | (tl_cty >= ry2) |
                      (br_ctx <= rx1) | (br_ctx >= rx2) |
                      (br_cty <= ry1) | (br_cty >= ry2))

        scores = (tl_s[:, None] + br_s[None, :]) / 2.0
        bad = ((tl_c[:, None] != br_c[None, :]) |
               (dists > distance_threshold) |
               (boxes[..., 2] <= boxes[..., 0]) |
               (boxes[..., 3] <= boxes[..., 1]) | ct_bad)
        scores = jnp.where(bad, -1.0, scores)

        scores, inds = fast_topk(scores.reshape(-1), num_dets)
        boxes = boxes.reshape(-1, 4)[inds]
        clses = jnp.broadcast_to(tl_c[:, None],
                                 (k, k)).reshape(-1)[inds]
        return boxes, scores, clses

    def get_bboxes(self, tl_heats, br_heats, tl_embs, br_embs, tl_offs,
                   br_offs, img_shapes, scale_factors, cfg=None,
                   rescale: bool = False, with_nms: bool = True):
        cfg = dict(cfg or self.test_cfg)
        k = cfg.get('corner_topk', 100)
        kernel = cfg.get('local_maximum_kernel', 3)
        dthr = cfg.get('distance_threshold', 0.5)
        num_dets = cfg.get('num_dets', 1000)
        max_per_img = cfg.get('max_per_img', 100)
        nms_cfg = dict(cfg.get('nms', dict(type='soft_nms')))

        def per_image(tl_h, br_h, tl_e, br_e, tl_o, br_o, img_hw, sf):
            boxes, scores, clses = self.decode_heatmap(
                jax.nn.sigmoid(tl_h.astype(jnp.float32)),
                jax.nn.sigmoid(br_h.astype(jnp.float32)),
                tl_o.astype(jnp.float32), br_o.astype(jnp.float32),
                tl_e.astype(jnp.float32), br_e.astype(jnp.float32),
                img_hw, k=k, kernel=kernel, distance_threshold=dthr,
                num_dets=num_dets)
            if rescale:
                boxes = boxes / sf[None, :4]
            valid = scores > -0.1
            if not with_nms:
                return boxes, scores, clses, valid
            if nms_cfg.get('type', 'soft_nms') == 'soft_nms':
                # class-offset trick keeps soft-nms class-separated
                off = clses.astype(jnp.float32)[:, None] * 1e4
                res = soft_nms(boxes + off, scores,
                               iou_threshold=nms_cfg.get('iou_threshold',
                                                         0.3),
                               sigma=nms_cfg.get('sigma', 0.5),
                               min_score=nms_cfg.get('min_score', 1e-3),
                               method=nms_cfg.get('method', 'gaussian'),
                               max_out=max_per_img, valid=valid)
                dets = jnp.concatenate(
                    [res.dets[:, :4] - jnp.take(
                        off, res.inds, axis=0),
                     res.dets[:, 4:5]], -1)
                labels = jnp.take(clses, res.inds)
                return dets, labels, res.valid
            res = batched_nms(boxes, scores, clses,
                              nms_cfg.get('iou_threshold', 0.5),
                              max_per_img, valid=valid)
            labels = jnp.take(clses, res.inds)
            return res.dets, labels, res.valid

        outs = jax.vmap(per_image)(
            tl_heats[-1], br_heats[-1], tl_embs[-1], br_embs[-1],
            tl_offs[-1], br_offs[-1], img_shapes, scale_factors)
        if not with_nms:
            return outs
        from ...core.nms import MulticlassNMSResult
        return MulticlassNMSResult(
            dets=outs[0], labels=outs[1],
            inds=jnp.zeros(outs[1].shape, jnp.int32), valid=outs[2])


@HEADS.register_module()
class CentripetalHead(CornerHead):
    """CentripetalNet head (reference: centripetal_head.py:12) —
    embedding branch replaced by guiding-shift-conditioned DCN feature
    adaption + centripetal shift pairing."""
    guiding_shift_channels: int = 2
    centripetal_shift_channels: int = 2
    feat_adaption_conv_kernel: int = 3
    loss_guiding_shift: Optional[dict] = None
    loss_centripetal_shift: Optional[dict] = None

    with_guiding_shift = True
    with_centripetal_shift = True

    def setup(self):
        super().setup()
        from ...ops.deform_conv import DeformConv2d
        self._loss_guiding = build_loss(dict(
            self.loss_guiding_shift or dict(type='SmoothL1Loss', beta=1.0,
                                            loss_weight=0.05)))
        self._loss_centripetal = build_loss(dict(
            self.loss_centripetal_shift or dict(type='SmoothL1Loss',
                                                beta=1.0, loss_weight=1)))
        n = self.num_feat_levels
        k = self.feat_adaption_conv_kernel
        self.tl_guiding = [_Branch(2, dtype=self.dtype,
                                   name=f'tl_guiding{i}')
                           for i in range(n)]
        self.br_guiding = [_Branch(2, dtype=self.dtype,
                                   name=f'br_guiding{i}')
                           for i in range(n)]
        self.tl_dcn_offset = [
            nn.Conv(k * k * 2, (1, 1), use_bias=False, dtype=self.dtype,
                    name=f'tl_dcn_offset{i}') for i in range(n)]
        self.br_dcn_offset = [
            nn.Conv(k * k * 2, (1, 1), use_bias=False, dtype=self.dtype,
                    name=f'br_dcn_offset{i}') for i in range(n)]
        self.tl_adaption = [
            DeformConv2d(self.in_channels, (k, k), dtype=self.dtype,
                         name=f'tl_adaption{i}') for i in range(n)]
        self.br_adaption = [
            DeformConv2d(self.in_channels, (k, k), dtype=self.dtype,
                         name=f'br_adaption{i}') for i in range(n)]
        self.tl_centripetal = [_Branch(2, dtype=self.dtype,
                                       name=f'tl_centripetal{i}')
                               for i in range(n)]
        self.br_centripetal = [_Branch(2, dtype=self.dtype,
                                       name=f'br_centripetal{i}')
                               for i in range(n)]

    def forward_single(self, x, lvl, train: bool = False,
                       return_pool: bool = False):
        (tl_heat, br_heat, _, _, tl_off, br_off, tl_pool,
         br_pool) = super().forward_single(x, lvl, train,
                                           return_pool=True)
        tl_guiding = self.tl_guiding[lvl](tl_pool, train)
        br_guiding = self.br_guiding[lvl](br_pool, train)
        tl_doff = self.tl_dcn_offset[lvl](
            jax.lax.stop_gradient(tl_guiding))
        br_doff = self.br_dcn_offset[lvl](
            jax.lax.stop_gradient(br_guiding))
        tl_ad = self.tl_adaption[lvl](tl_pool, tl_doff)
        br_ad = self.br_adaption[lvl](br_pool, br_doff)
        tl_ctr = self.tl_centripetal[lvl](tl_ad, train)
        br_ctr = self.br_centripetal[lvl](br_ad, train)
        return (tl_heat, br_heat, tl_off, br_off, tl_guiding,
                br_guiding, tl_ctr, br_ctr)

    def loss(self, rng, tl_heats, br_heats, tl_offs, br_offs,
             tl_guidings, br_guidings, tl_ctrs, br_ctrs, gt_bboxes,
             gt_valid, gt_labels, img_shapes, pad_shapes):
        feat_hw = (tl_heats[-1].shape[1], tl_heats[-1].shape[2])
        t = self.get_targets(gt_bboxes, gt_valid, gt_labels, feat_hw,
                             pad_shapes)
        tl_mask = (jnp.max(t['tl_heat'], -1) == 1.0)[..., None]
        br_mask = (jnp.max(t['br_heat'], -1) == 1.0)[..., None]
        det_loss = off_loss = guiding_loss = centripetal_loss = 0.0
        for lvl in range(len(tl_heats)):
            hp = jax.nn.sigmoid(tl_heats[lvl].astype(jnp.float32))
            det_l = self._loss_heatmap(
                hp, t['tl_heat'],
                avg_factor=jnp.maximum(jnp.sum(t['tl_heat'] == 1.0), 1))
            hp = jax.nn.sigmoid(br_heats[lvl].astype(jnp.float32))
            det_l = det_l + self._loss_heatmap(
                hp, t['br_heat'],
                avg_factor=jnp.maximum(jnp.sum(t['br_heat'] == 1.0), 1))
            det_loss = det_loss + det_l / 2.0

            def masked(loss_fn, pred, tgt, mask):
                wm = jnp.broadcast_to(mask, tgt.shape).astype(jnp.float32)
                return loss_fn(pred.astype(jnp.float32), tgt, weight=wm,
                               avg_factor=jnp.maximum(jnp.sum(mask), 1))

            off_loss = off_loss + (
                masked(self._loss_offset, tl_offs[lvl], t['tl_off'],
                       tl_mask) +
                masked(self._loss_offset, br_offs[lvl], t['br_off'],
                       br_mask)) / 2.0
            guiding_loss = guiding_loss + (
                masked(self._loss_guiding, tl_guidings[lvl],
                       t['tl_guiding'], tl_mask) +
                masked(self._loss_guiding, br_guidings[lvl],
                       t['br_guiding'], br_mask)) / 2.0
            centripetal_loss = centripetal_loss + (
                masked(self._loss_centripetal, tl_ctrs[lvl],
                       t['tl_centripetal'], tl_mask) +
                masked(self._loss_centripetal, br_ctrs[lvl],
                       t['br_centripetal'], br_mask)) / 2.0
        return dict(det_loss=det_loss, off_loss=off_loss,
                    guiding_loss=guiding_loss,
                    centripetal_loss=centripetal_loss)

    def get_bboxes(self, tl_heats, br_heats, tl_offs, br_offs,
                   tl_guidings, br_guidings, tl_ctrs, br_ctrs,
                   img_shapes, scale_factors, cfg=None,
                   rescale: bool = False, with_nms: bool = True):
        cfg = dict(cfg or self.test_cfg)
        k = cfg.get('corner_topk', 100)
        kernel = cfg.get('local_maximum_kernel', 3)
        dthr = cfg.get('distance_threshold', 0.5)
        num_dets = cfg.get('num_dets', 1000)
        max_per_img = cfg.get('max_per_img', 100)
        nms_cfg = dict(cfg.get('nms', dict(type='soft_nms')))

        def per_image(tl_h, br_h, tl_o, br_o, tl_c_, br_c_, img_hw, sf):
            boxes, scores, clses = self.decode_heatmap(
                jax.nn.sigmoid(tl_h.astype(jnp.float32)),
                jax.nn.sigmoid(br_h.astype(jnp.float32)),
                tl_o.astype(jnp.float32), br_o.astype(jnp.float32),
                None, None, img_hw, k=k, kernel=kernel,
                distance_threshold=dthr, num_dets=num_dets,
                tl_centripetal=tl_c_.astype(jnp.float32),
                br_centripetal=br_c_.astype(jnp.float32))
            if rescale:
                boxes = boxes / sf[None, :4]
            valid = scores > -0.1
            if nms_cfg.get('type', 'soft_nms') == 'soft_nms':
                off = clses.astype(jnp.float32)[:, None] * 1e4
                res = soft_nms(boxes + off, scores,
                               iou_threshold=nms_cfg.get('iou_threshold',
                                                         0.3),
                               sigma=nms_cfg.get('sigma', 0.5),
                               min_score=nms_cfg.get('min_score', 1e-3),
                               method=nms_cfg.get('method', 'gaussian'),
                               max_out=max_per_img, valid=valid)
                dets = jnp.concatenate(
                    [res.dets[:, :4] - jnp.take(off, res.inds, axis=0),
                     res.dets[:, 4:5]], -1)
                return dets, jnp.take(clses, res.inds), res.valid
            res = batched_nms(boxes, scores, clses,
                              nms_cfg.get('iou_threshold', 0.5),
                              max_per_img, valid=valid)
            return res.dets, jnp.take(clses, res.inds), res.valid

        outs = jax.vmap(per_image)(
            tl_heats[-1], br_heats[-1], tl_offs[-1], br_offs[-1],
            tl_ctrs[-1], br_ctrs[-1], img_shapes, scale_factors)
        from ...core.nms import MulticlassNMSResult
        return MulticlassNMSResult(
            dets=outs[0], labels=outs[1],
            inds=jnp.zeros(outs[1].shape, jnp.int32), valid=outs[2])
