"""CascadeRPN (reference: mmdet/models/dense_heads/
cascade_rpn_head.py:671; arXiv:1909.06720) — two-stage RPN: stage 1
regresses single square anchors under a RegionAssigner, stage 2 runs an
anchor-guided deformable ("offset") adaptive conv over the refined
anchors with a MaxIoU assignment.

TPU-native notes:
- anchor_offset becomes a batched closed-form computation feeding our
  DeformConv2d's (B, H, W, 2K) offset maps.
- The anchor refinement chain is recomputed inside loss/get_proposals
  from the stage predictions (pure math, CSE'd by XLA) so the head
  keeps the framework's (outs) → loss(*outs) calling convention."""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import (HEADS, build_anchor_generator, build_assigner,
                       build_bbox_coder, build_loss, build_sampler)
from ..layers import normal_init
from ...core.anchors import anchor_inside_flags
from ...core.nms import batched_nms, fast_topk
from ...ops.deform_conv import DeformConv2d


class AdaptiveConv(nn.Module):
    """(reference :18) — dilated 3×3 or offset-driven deform conv."""
    out_channels: int
    adapt_type: str = 'dilation'
    dilation: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, offset=None):
        if self.adapt_type == 'offset':
            return DeformConv2d(self.out_channels, (3, 3),
                                dtype=self.dtype,
                                kernel_init=normal_init(0.01),
                                name='conv')(x, offset)
        d = self.dilation
        return nn.Conv(self.out_channels, (3, 3),
                       padding=[(d, d)] * 2, kernel_dilation=d,
                       dtype=self.dtype, kernel_init=normal_init(0.01),
                       name='conv')(x)


@HEADS.register_module()
class StageCascadeRPNHead(nn.Module):
    """(reference :95)."""
    in_channels: int = 256
    feat_channels: int = 256
    anchor_generator: Optional[dict] = None
    adapt_cfg: Optional[dict] = None
    bridged_feature: bool = False
    with_cls: bool = True
    sampling: bool = True
    reg_decoded_bbox: bool = False
    bbox_coder: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        ag = dict(self.anchor_generator or dict(
            type='AnchorGenerator', scales=[8], ratios=[1.0],
            strides=[4, 8, 16, 32, 64]))
        self.prior_generator = build_anchor_generator(ag)
        self.anchor_strides = [s[0] for s in
                               self.prior_generator.strides]
        self.anchor_scales = ag.get('scales', [8])
        self._bbox_coder = build_bbox_coder(dict(
            self.bbox_coder or dict(type='DeltaXYWHBBoxCoder',
                                    target_means=[0., 0., 0., 0.],
                                    target_stds=[1., 1., 1., 1.])))
        self._loss_bbox = build_loss(dict(
            self.loss_bbox or dict(type='IoULoss', linear=True,
                                   loss_weight=10.0)))
        self._loss_cls = build_loss(dict(
            self.loss_cls or dict(type='CrossEntropyLoss',
                                  use_sigmoid=True, loss_weight=1.0))) \
            if self.with_cls else None
        if self.train_cfg:
            self._assigner = build_assigner(dict(
                self.train_cfg['assigner']))
            self._sampler = build_sampler(dict(
                self.train_cfg.get('sampler',
                                   dict(type='PseudoSampler')))) \
                if self.sampling else None
        adapt = dict(self.adapt_cfg or dict(type='dilation',
                                            dilation=3))
        self.rpn_conv = AdaptiveConv(
            self.feat_channels, adapt_type=adapt.get('type', 'dilation'),
            dilation=adapt.get('dilation', 3), dtype=self.dtype,
            name='rpn_conv')
        self.adapt_type = adapt.get('type', 'dilation')
        if self.with_cls:
            self.rpn_cls = nn.Conv(1, (1, 1), dtype=self.dtype,
                                   kernel_init=normal_init(0.01),
                                   name='rpn_cls')
        self.rpn_reg = nn.Conv(4, (1, 1), dtype=self.dtype,
                               kernel_init=normal_init(0.01),
                               name='rpn_reg')

    # ------------------------------------------------------------ forward
    def __call__(self, feats, offset_list=None, train: bool = False):
        bridged, cls_out, reg_out = [], [], []
        for lvl, x in enumerate(feats):
            off = offset_list[lvl] if offset_list is not None else None
            y = nn.relu(self.rpn_conv(x, off))
            bridged.append(y if self.bridged_feature else x)
            cls_out.append(self.rpn_cls(y) if self.with_cls else None)
            reg_out.append(self.rpn_reg(y))
        return tuple(bridged), tuple(cls_out), tuple(reg_out)

    # ------------------------------------------------------------ offsets
    def anchor_offset(self, anchors_per_level, featmap_sizes):
        """anchors_per_level: per level (B, H*W, 4) → per level
        (B, H, W, 18) deform offsets (reference :322)."""
        outs = []
        idx = np.arange(-1, 2, dtype=np.float32)
        yy, xx = np.meshgrid(idx, idx, indexing='ij')
        xx = xx.reshape(-1)
        yy = yy.reshape(-1)
        for lvl, a in enumerate(anchors_per_level):
            stride = self.anchor_strides[lvl]
            fh, fw = featmap_sizes[lvl]
            w = (a[..., 2] - a[..., 0]) / stride
            h = (a[..., 3] - a[..., 1]) / stride
            sw = w / 2.0 - 1.0
            sh = h / 2.0 - 1.0
            off_x = sw[..., None] * xx                    # (B, N, 9)
            off_y = sh[..., None] * yy
            cx = (a[..., 0] + a[..., 2]) * 0.5 / stride
            cy = (a[..., 1] + a[..., 3]) * 0.5 / stride
            gx = np.tile(np.arange(fw, dtype=np.float32), fh)
            gy = np.repeat(np.arange(fh, dtype=np.float32), fw)
            off_x = off_x + (cx - gx)[..., None]
            off_y = off_y + (cy - gy)[..., None]
            off = jnp.stack([off_y, off_x], -1).reshape(
                a.shape[0], fh, fw, 18)
            outs.append(off)
        return outs

    # ------------------------------------------------------------ targets
    def stage_targets(self, rng, featmap_sizes, anchors, gt_bboxes,
                      gt_valid, gt_labels, img_shapes, pad_shapes):
        """anchors (B, N, 4) per-image (possibly refined). Returns
        labels/weights/targets on the full set."""
        flat_sizes = featmap_sizes
        num_lvl = [h * w * self.prior_generator.num_base_anchors[0]
                   for (h, w) in flat_sizes]
        b = gt_bboxes.shape[0]
        region = type(self._assigner).__name__ == 'RegionAssigner'

        def single(r, a, gb, gv, ish, ps):
            valid_flags = jnp.concatenate(
                self.prior_generator.valid_flags(flat_sizes, ps), 0)
            inside = anchor_inside_flags(
                a, valid_flags, ish,
                self.train_cfg.get('allowed_border', -1))
            if region:
                per_lvl = []
                s0 = 0
                for n in num_lvl:
                    per_lvl.append(a[s0:s0 + n])
                    s0 += n
                assign = self._assigner.assign(
                    per_lvl, flat_sizes, self.anchor_strides,
                    self.anchor_scales[0], gb, gv,
                    bbox_valid=inside)
            else:
                assign = self._assigner.assign(a, gb, gv, None,
                                               bbox_valid=inside)
            if self._sampler is not None:
                samp = self._sampler.sample(r, assign, a, gb, gv, None,
                                            bbox_valid=inside)
                n = a.shape[0]
                labels = jnp.ones((n,), jnp.int32)
                lw = jnp.zeros((n,), jnp.float32)
                bt = jnp.zeros((n, 4), jnp.float32)
                bw = jnp.zeros((n,), jnp.float32)
                pos = samp.is_pos & samp.valid
                labels = labels.at[samp.inds].set(
                    jnp.where(pos, 0, 1), mode='drop')
                lw = lw.at[samp.inds].add(
                    samp.valid.astype(jnp.float32), mode='drop')
                bt = bt.at[samp.inds].set(
                    jnp.where(pos[:, None], samp.pos_gt_bboxes, 0.0),
                    mode='drop')
                bw = bw.at[samp.inds].set(pos.astype(jnp.float32),
                                          mode='drop')
                num_pos = samp.num_pos
                num_neg = samp.num_neg
            else:
                pos = assign.gt_inds > 0
                pos_gt = jnp.clip(assign.gt_inds - 1, 0)
                labels = jnp.where(pos, 0, 1)
                lw = (assign.gt_inds >= 0).astype(jnp.float32)
                bt = jnp.where(pos[:, None],
                               jnp.take(gb, pos_gt, axis=0), 0.0)
                bw = pos.astype(jnp.float32)
                num_pos = jnp.sum(pos)
                num_neg = jnp.sum(assign.gt_inds == 0)
            return labels, lw, bt, bw, num_pos, num_neg

        rngs = jax.random.split(rng, b)
        return jax.vmap(single)(rngs, anchors, gt_bboxes, gt_valid,
                                img_shapes, pad_shapes)

    def stage_loss(self, rng, cls_scores, bbox_preds, anchors,
                   featmap_sizes, gt_bboxes, gt_valid, img_shapes,
                   pad_shapes, stage):
        b = gt_bboxes.shape[0]
        (labels, lw, bt, bw, num_pos, num_neg) = self.stage_targets(
            rng, featmap_sizes, anchors, gt_bboxes, gt_valid, None,
            img_shapes, pad_shapes)
        if self.sampling:
            num_total = jnp.maximum(
                jnp.sum(num_pos + num_neg).astype(jnp.float32), 1.0)
        else:
            num_total = float(labels.size) / 200.0
        box_flat = jnp.concatenate([
            p.astype(jnp.float32).reshape(b, -1, 4)
            for p in bbox_preds], 1)
        decoded = self._bbox_coder.decode(anchors, box_flat)
        losses = {}
        if self.with_cls:
            cls_flat = jnp.concatenate([
                s.astype(jnp.float32).reshape(b, -1, 1)
                for s in cls_scores], 1)
            # binary sigmoid CE: label 0 = object
            p = cls_flat[..., 0]
            t = (labels == 0).astype(jnp.float32)
            bce = jnp.maximum(p, 0) - p * t + \
                jnp.log1p(jnp.exp(-jnp.abs(p)))
            losses[f's{stage}.loss_rpn_cls'] = \
                jnp.sum(bce * lw) / num_total
        losses[f's{stage}.loss_rpn_reg'] = self._loss_bbox(
            decoded.reshape(-1, 4), bt.reshape(-1, 4),
            weight=bw.reshape(-1), avg_factor=num_total)
        return losses

    def refine(self, anchors, bbox_preds, img_shapes):
        """(B, N, 4) anchors + per-level preds → decoded anchors."""
        b, n = anchors.shape[:2]
        box_flat = jnp.concatenate([
            jax.lax.stop_gradient(p).astype(jnp.float32)
            .reshape(b, -1, 4) for p in bbox_preds], 1)
        hs = jnp.repeat(img_shapes[:, 0:1], n, axis=0).reshape(-1, 1)
        ws = jnp.repeat(img_shapes[:, 1:2], n, axis=0).reshape(-1, 1)
        out = self._bbox_coder.decode(
            anchors.reshape(-1, 4), box_flat.reshape(-1, 4),
            max_shape=(hs, ws))
        return out.reshape(b, n, 4)


@HEADS.register_module()
class CascadeRPNHead(nn.Module):
    """(reference :671)."""
    num_stages: int = 2
    stages: Optional[Sequence[dict]] = None
    train_cfg: Optional[Any] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        assert self.num_stages == len(self.stages)
        tc = self.train_cfg
        built = []
        for i, st in enumerate(self.stages):
            cfg = dict(st)
            cfg.pop('type', None)
            cfg['train_cfg'] = (tc[i] if tc is not None else None)
            cfg['test_cfg'] = self.test_cfg
            cfg['dtype'] = self.dtype
            built.append(StageCascadeRPNHead(name=f'stages{i}', **cfg))
        self._stages = built

    def _anchors0(self, featmap_sizes, b):
        per_lvl = self._stages[0].prior_generator.grid_anchors(
            featmap_sizes)
        return [jnp.broadcast_to(a[None], (b,) + a.shape)
                for a in per_lvl]

    def _run(self, feats, img_shapes, train):
        featmap_sizes = tuple((f.shape[1], f.shape[2]) for f in feats)
        b = feats[0].shape[0]
        anchors_l = self._anchors0(featmap_sizes, b)
        x = feats
        all_cls, all_box = [], []
        for i, stage in enumerate(self._stages):
            offs = (stage.anchor_offset(anchors_l, featmap_sizes)
                    if stage.adapt_type == 'offset' else None)
            x, cls, box = stage(x, offs, train=train)
            all_cls.append(cls)
            all_box.append(box)
            if i < self.num_stages - 1:
                flat = jnp.concatenate(anchors_l, 1)
                refined = stage.refine(flat, box, img_shapes)
                out_l = []
                s0 = 0
                for a in anchors_l:
                    n = a.shape[1]
                    out_l.append(refined[:, s0:s0 + n])
                    s0 += n
                anchors_l = out_l
        return tuple(all_cls), tuple(all_box), anchors_l

    def __call__(self, feats, train: bool = False):
        # Trace every stage so init creates all parameters; the real
        # train/test passes recompute the chain with true image shapes
        # inside loss/get_proposals (XLA CSEs the overlap).
        b = feats[0].shape[0]
        sentinel = jnp.full((b, 2), 100000, jnp.int32)
        self._run(feats, sentinel, train)
        return (feats,)

    def loss(self, rng, feats, gt_bboxes, gt_valid, gt_labels,
             img_shapes, pad_shapes) -> Dict[str, jnp.ndarray]:
        featmap_sizes = tuple((f.shape[1], f.shape[2]) for f in feats)
        all_cls, all_box, _ = self._run(feats, img_shapes, True)
        b = gt_bboxes.shape[0]
        anchors_l = self._anchors0(featmap_sizes, b)
        losses = {}
        for i, stage in enumerate(self._stages):
            flat = jnp.concatenate(anchors_l, 1)
            rng, srng = jax.random.split(rng)
            losses.update(stage.stage_loss(
                srng, all_cls[i], all_box[i], flat, featmap_sizes,
                gt_bboxes, gt_valid, img_shapes, pad_shapes, i))
            if i < self.num_stages - 1:
                refined = stage.refine(flat, all_box[i], img_shapes)
                out_l = []
                s0 = 0
                for a in anchors_l:
                    n = a.shape[1]
                    out_l.append(refined[:, s0:s0 + n])
                    s0 += n
                anchors_l = out_l
        return losses

    def get_proposals(self, feats, img_shapes, cfg):
        all_cls, all_box, anchors_l = self._run(feats, img_shapes,
                                                False)
        stage = self._stages[-1]
        cls_scores = all_cls[-1]
        bbox_preds = all_box[-1]
        nms_pre = cfg.get('nms_pre', 1000)
        max_per_img = cfg.get('max_per_img', cfg.get('nms_post', 1000))
        min_bbox_size = cfg.get('min_bbox_size', 0)
        iou_thr = dict(cfg['nms'])['iou_threshold'] if 'nms' in cfg \
            else cfg.get('nms_thr', 0.7)
        b = feats[0].shape[0]
        flat_scores = [s.reshape(b, -1) for s in cls_scores]
        flat_preds = [p.reshape(b, -1, 4) for p in bbox_preds]

        def per_image(scores_lvls, preds_lvls, anchors_lvls, img_shape):
            all_boxes, all_scores, all_ids, all_valid = [], [], [], []
            for lvl in range(len(scores_lvls)):
                score = jax.nn.sigmoid(
                    scores_lvls[lvl].astype(jnp.float32))
                k = min(nms_pre, score.shape[0])
                top_s, top_i = fast_topk(score, k)
                boxes = stage._bbox_coder.decode(
                    anchors_lvls[lvl][top_i], preds_lvls[lvl][top_i],
                    max_shape=img_shape)
                valid = jnp.ones((k,), bool)
                if min_bbox_size >= 0:
                    w = boxes[:, 2] - boxes[:, 0]
                    h = boxes[:, 3] - boxes[:, 1]
                    valid &= (w > min_bbox_size) & (h > min_bbox_size)
                all_boxes.append(boxes)
                all_scores.append(top_s)
                all_ids.append(jnp.full((k,), lvl, jnp.int32))
                all_valid.append(valid)
            boxes = jnp.concatenate(all_boxes, 0)
            scores = jnp.concatenate(all_scores, 0)
            ids = jnp.concatenate(all_ids, 0)
            valid = jnp.concatenate(all_valid, 0)
            res = batched_nms(boxes, scores, ids, iou_thr, max_per_img,
                              valid=valid)
            return res.dets[:, :4], res.dets[:, 4], res.valid

        return jax.vmap(per_image)(flat_scores, flat_preds, anchors_l,
                                   img_shapes)
