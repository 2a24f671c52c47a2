"""Hybrid Task Cascade (reference: mmdet/models/roi_heads/
htc_roi_head.py:11, arXiv:1901.07518) — cascade with:

- a fused multi-level semantic branch whose RoI features are added to
  bbox/mask features (`semantic_fusion`),
- interleaved execution (mask branch trains on the refined boxes,
  re-assigned/re-sampled),
- mask information flow (stage i's mask head consumes the fused conv
  features of stages 0..i-1).

Static-shape port: sampling/refine machinery is the CascadeRoIHead's;
the semantic pathway is dense and needs no shape tricks.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ..builder import (HEADS, build_head, build_loss,
                       build_roi_extractor)
from ..layers import ConvModule
from .cascade_roi_head import CascadeRoIHead
from .mask_heads import FCNMaskHead


@HEADS.register_module()
class FusedSemanticHead(nn.Module):
    """(reference: mask_heads/fused_semantic_head.py:10)."""
    num_ins: int = 5
    fusion_level: int = 1
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 183
    ignore_label: int = 255
    loss_weight: float = 0.2
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    # SCNetSemanticHead (scnet_semantic_head.py): swap the conv tower
    # for num_convs//2 SimplifiedBasicBlocks packed as 'convs'
    conv_to_res: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = ConvModule(self.in_channels, 1, dtype=self.dtype,
                       act_cfg=dict(type='ReLU'),
                       name=f'lateral_convs{self.fusion_level}')(
                           feats[self.fusion_level], train=train)
        h, w = x.shape[1:3]
        for i, feat in enumerate(feats[:self.num_ins]):
            if i == self.fusion_level:
                continue
            # reference fuses with align_corners=True bilinear
            # (fused_semantic_head.py:92) — NOT half-pixel
            from ...ops.interpolate import torch_bilinear_resize
            f = torch_bilinear_resize(feat, (h, w), align_corners=True)
            x = x + ConvModule(self.in_channels, 1, dtype=self.dtype,
                               act_cfg=dict(type='ReLU'),
                               name=f'lateral_convs{i}')(f, train=train)
        if self.conv_to_res:
            from .scnet import SimplifiedBasicBlock
            for i in range(self.num_convs // 2):
                x = SimplifiedBasicBlock(
                    self.conv_out_channels, dtype=self.dtype,
                    name=f'convs{i}')(x, train=train)
        else:
            for i in range(self.num_convs):
                x = ConvModule(self.conv_out_channels, 3, padding=1,
                               norm_cfg=self.norm_cfg,
                               act_cfg=dict(type='ReLU'),
                               dtype=self.dtype,
                               name=f'convs{i}')(x, train=train)
        mask_pred = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                            name='conv_logits')(x)
        embedding = ConvModule(self.conv_out_channels, 1,
                               norm_cfg=self.norm_cfg,
                               act_cfg=dict(type='ReLU'),
                               dtype=self.dtype,
                               name='conv_embedding')(x, train=train)
        return mask_pred, embedding

    def loss(self, mask_pred, labels):
        """Softmax CE with ignore_label (reference :100)."""
        pred = mask_pred.astype(jnp.float32)
        labels = labels.astype(jnp.int32)
        if pred.shape[1:3] != labels.shape[1:3]:
            labels = jax.image.resize(
                labels.astype(jnp.float32),
                (labels.shape[0],) + pred.shape[1:3],
                method='nearest').astype(jnp.int32)
        valid = (labels != self.ignore_label) & (labels >= 0) \
            & (labels < self.num_classes)
        safe = jnp.clip(labels, 0, self.num_classes - 1)
        logp = jax.nn.log_softmax(pred, axis=-1)
        ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        ce = jnp.where(valid, ce, 0.0)
        return self.loss_weight * jnp.sum(ce) / jnp.maximum(
            jnp.sum(valid), 1.0)


@HEADS.register_module()
class HTCMaskHead(FCNMaskHead):
    """FCNMaskHead + 1x1 residual fuse for mask info flow
    (reference: mask_heads/htc_mask_head.py:8)."""
    with_conv_res: bool = True

    def setup(self):
        super().setup()
        if self.with_conv_res:
            self.conv_res = ConvModule(self.conv_out_channels, 1,
                                       act_cfg=dict(type='ReLU'),
                                       dtype=self.dtype,
                                       name='conv_res')

    def __call__(self, x, res_feat=None, return_logits: bool = True,
                 return_feat: bool = False, train: bool = False):
        if res_feat is not None:
            x = x + self.conv_res(res_feat, train=train)
        for conv in self.convs:
            x = conv(x, train=train)
        res = x
        outs = []
        if return_logits:
            if self.upsample_type == 'deconv':
                x = nn.relu(self.upsample(x))
            outs.append(self.conv_logits(x))
        if return_feat:
            outs.append(res)
        return tuple(outs) if len(outs) > 1 else outs[0]


@HEADS.register_module()
class HybridTaskCascadeRoIHead(CascadeRoIHead):
    semantic_roi_extractor: Optional[dict] = None
    semantic_head: Optional[dict] = None
    semantic_fusion: Sequence[str] = ('bbox', 'mask')
    interleaved: bool = True
    mask_info_flow: bool = True

    def setup(self):
        super().setup()
        if self.semantic_head is not None:
            self._semantic_extractor = build_roi_extractor(
                dict(self.semantic_roi_extractor))
            self._semantic_head = build_head(
                dict(self.semantic_head, dtype=self.dtype,
                     name='_semantic_head'))

    @property
    def with_semantic(self):
        return self.semantic_head is not None

    def _fuse_semantic(self, roi_feats, semantic_feat, rois):
        """RoIAlign the semantic embedding and add (avg-pooled to the
        target spatial size when mismatched, reference :171-176)."""
        sem = self._semantic_extractor([semantic_feat], rois)
        if sem.shape[1] != roi_feats.shape[1]:
            k = sem.shape[1] // roi_feats.shape[1]
            sem = nn.avg_pool(sem, (k, k), strides=(k, k))
        return roi_feats + sem.astype(roi_feats.dtype)

    def _mask_flow_pred(self, stage, mask_feats, train: bool = False):
        """Mask info flow: chain conv features of heads 0..stage-1 into
        head `stage` (reference :146-156)."""
        last_feat = None
        if self.mask_info_flow:
            for i in range(stage):
                last_feat = self._mask_heads[i](
                    mask_feats, last_feat, return_logits=False,
                    return_feat=True, train=train)
        return self._mask_heads[stage](mask_feats, last_feat,
                                       return_logits=True,
                                       return_feat=False, train=train)

    def forward_dummy(self, feats, num_rois: int = 100):
        rois = jnp.concatenate([
            jnp.zeros((num_rois, 1)),
            jnp.tile(np.asarray([[0., 0., 32., 32.]], np.float32),
                     (num_rois, 1))], axis=-1)
        sem_feat = None
        outs = ()
        if self.with_semantic:
            sem_pred, sem_feat = self._semantic_head(feats)
            outs += (sem_pred,)
        for head in self._bbox_heads:
            bf = self._bbox_extractor(feats, rois)
            if sem_feat is not None and 'bbox' in self.semantic_fusion:
                bf = self._fuse_semantic(bf, sem_feat, rois)
            outs += head(bf)
        if self.with_mask:
            mf = self._mask_extractor(feats, rois)
            if sem_feat is not None and 'mask' in self.semantic_fusion:
                mf = self._fuse_semantic(mf, sem_feat, rois)
            for stage in range(self.num_stages):
                outs += (self._mask_flow_pred(stage, mf),)
        return outs

    # ---------------------------------------------------------------- train
    def forward_train(self, rng, feats, proposals, proposal_valid,
                      gt_bboxes, gt_valid, gt_labels, gt_masks,
                      img_shapes,
                      gt_semantic_seg=None) -> Dict[str, jnp.ndarray]:
        """(reference: htc_roi_head.py:214 forward_train)."""
        b = proposals.shape[0]
        losses: Dict[str, jnp.ndarray] = {}

        sem_feat = None
        if self.with_semantic:
            sem_pred, sem_feat = self._semantic_head(feats, train=True)
            if gt_semantic_seg is not None:
                losses['loss_semantic_seg'] = self._semantic_head.loss(
                    sem_pred, gt_semantic_seg)

        cur_props, cur_valid = proposals, proposal_valid
        for stage in range(self.num_stages):
            lw = self.stage_loss_weights[stage]
            head = self._bbox_heads[stage]
            sampler = self._samplers[stage]
            assigner = self._assigners[stage]
            num = sampler.num

            rng, srng = jax.random.split(rng)
            rngs = jax.random.split(srng, b)

            def assign_sample(r, props, pvalid, gb, gv, gl):
                a = assigner.assign(props, gb, gv, gl, bbox_valid=pvalid)
                return sampler.sample(r, a, props, gb, gv, gl,
                                      bbox_valid=pvalid)

            samp = jax.vmap(assign_sample)(rngs, cur_props, cur_valid,
                                           gt_bboxes, gt_valid, gt_labels)
            batch_col = jnp.repeat(np.arange(b, dtype=np.float32), num)
            rois = jnp.concatenate(
                [batch_col[:, None], samp.bboxes.reshape(-1, 4)], -1)
            bbox_feats = self._bbox_extractor(feats, rois)
            if sem_feat is not None and 'bbox' in self.semantic_fusion:
                bbox_feats = self._fuse_semantic(bbox_feats, sem_feat,
                                                 rois)
            cls_score, bbox_pred = head(bbox_feats, train=True)
            tgt = jax.vmap(lambda s: head.get_targets(
                s, self._stage_cfgs[stage]))(samp)
            labels, label_weights, bbox_targets, bbox_weights = \
                jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]),
                             tgt)
            stage_losses = head.loss(cls_score, bbox_pred, rois, labels,
                                     label_weights, bbox_targets,
                                     bbox_weights)
            for k, v in stage_losses.items():
                losses[f's{stage}.{k}'] = v * lw if 'loss' in k else v

            # refine for interleaved mask training + next stage
            bg = head.num_classes
            cls_arg = jnp.argmax(cls_score[:, :-1], axis=-1)
            roi_labels = jnp.where(labels == bg, cls_arg, labels)
            img_shape_per_roi = jnp.repeat(img_shapes, num, axis=0)
            refined = jax.lax.stop_gradient(head.regress_by_class(
                rois, roi_labels, bbox_pred,
                (img_shape_per_roi[:, 0:1], img_shape_per_roi[:, 1:2])))
            ref_props = refined[:, 1:].reshape(b, num, 4)
            g = gt_bboxes.shape[1]
            is_gt_slot = (samp.inds < g) & samp.is_pos \
                if sampler.add_gt_as_proposals else \
                jnp.zeros_like(samp.is_pos)
            ref_valid = samp.valid & ~is_gt_slot

            if self.with_mask and gt_masks is not None:
                if self.interleaved:
                    # re-assign/sample on the refined boxes (ref :305)
                    rng, mrng = jax.random.split(rng)
                    mrngs = jax.random.split(mrng, b)
                    msamp = jax.vmap(assign_sample)(
                        mrngs, ref_props, ref_valid, gt_bboxes,
                        gt_valid, gt_labels)
                else:
                    msamp = samp
                m = int(num * sampler.pos_fraction)
                pos_boxes = msamp.bboxes[:, :m]
                pos_inds = msamp.pos_gt_inds[:, :m]
                pos_mask = msamp.is_pos[:, :m]
                pos_labels = jnp.clip(msamp.pos_gt_labels[:, :m], 0)
                mask_rois = jnp.concatenate(
                    [jnp.repeat(np.arange(b, dtype=np.float32),
                                m)[:, None],
                     pos_boxes.reshape(-1, 4)], -1)
                mask_feats = self._mask_extractor(feats, mask_rois)
                if sem_feat is not None and \
                        'mask' in self.semantic_fusion:
                    mask_feats = self._fuse_semantic(mask_feats,
                                                     sem_feat, mask_rois)
                mask_pred = self._mask_flow_pred(stage, mask_feats,
                                                 train=True)
                mask_size = self._stage_cfgs[stage].get('mask_size', 28)
                targets = jax.vmap(
                    lambda gm, pb, pi:
                    self._mask_heads[stage].get_targets(
                        gm, pb, pi, mask_size))(gt_masks, pos_boxes,
                                                pos_inds)
                mloss = self._mask_heads[stage].loss(
                    mask_pred,
                    targets.reshape(-1, mask_size, mask_size),
                    pos_labels.reshape(-1),
                    pos_mask.reshape(-1).astype(jnp.float32))
                losses[f's{stage}.loss_mask'] = mloss['loss_mask'] * lw

            if stage < self.num_stages - 1:
                cur_props, cur_valid = ref_props, ref_valid
        return losses

    # ----------------------------------------------------------------- test
    def _ms_bbox_forward(self, feats, rois, img_shape_per_roi,
                         sem_feat=None):
        ms_scores = []
        bbox_pred = None
        for stage in range(self.num_stages):
            head = self._bbox_heads[stage]
            bbox_feats = self._bbox_extractor(feats, rois)
            if sem_feat is not None and 'bbox' in self.semantic_fusion:
                bbox_feats = self._fuse_semantic(bbox_feats, sem_feat,
                                                 rois)
            cls_score, bbox_pred = head(bbox_feats)
            ms_scores.append(cls_score.astype(jnp.float32))
            if stage < self.num_stages - 1:
                labels = jnp.argmax(cls_score[:, :-1], axis=-1)
                rois = head.regress_by_class(
                    rois, labels, bbox_pred,
                    (img_shape_per_roi[:, 0:1],
                     img_shape_per_roi[:, 1:2]))
        avg_scores = jax.nn.softmax(sum(ms_scores) / self.num_stages,
                                    axis=-1)
        return avg_scores, rois, bbox_pred

    def simple_test(self, feats, proposals, proposal_valid, img_shapes,
                    scale_factors, rescale: bool = True):
        """(reference: htc_roi_head.py:334 simple_test — stage mask
        preds accumulate through the info flow, then average)."""
        from ...core.nms import multiclass_nms
        cfg = dict(self.test_cfg)
        sem_feat = None
        if self.with_semantic:
            _, sem_feat = self._semantic_head(feats)
        b, p = proposals.shape[:2]
        batch_col = jnp.repeat(np.arange(b, dtype=np.float32), p)
        rois = jnp.concatenate(
            [batch_col[:, None], proposals.reshape(-1, 4)], -1)
        img_shape_per_roi = jnp.repeat(img_shapes, p, axis=0)
        avg_scores, rois, bbox_pred = self._ms_bbox_forward(
            feats, rois, img_shape_per_roi, sem_feat)
        last = self._bbox_heads[-1]

        def per_image(r, s, bp, sh, sf, v):
            boxes = last._bbox_coder.decode(r[:, 1:], bp, max_shape=sh)
            if rescale:
                boxes = (boxes.reshape(boxes.shape[0], -1, 4) /
                         sf[None, None, :4]).reshape(boxes.shape)
            s = jnp.where(v[:, None], s, 0.0)
            return multiclass_nms(boxes, s, cfg['score_thr'],
                                  dict(cfg['nms']), cfg['max_per_img'])

        nms_res = jax.vmap(per_image)(
            rois.reshape(b, p, 5), avg_scores.reshape(b, p, -1),
            bbox_pred.reshape(b, p, -1), img_shapes, scale_factors,
            proposal_valid)
        out = dict(dets=nms_res.dets, labels=nms_res.labels,
                   det_valid=nms_res.valid)

        if self.with_mask:
            max_out = nms_res.dets.shape[1]
            det_boxes = nms_res.dets[..., :4]
            if rescale:
                det_boxes = det_boxes * scale_factors[:, None, :4]
            mask_rois = jnp.concatenate(
                [jnp.repeat(np.arange(b, dtype=np.float32),
                            max_out)[:, None],
                 det_boxes.reshape(-1, 4)], -1)
            mask_feats = self._mask_extractor(feats, mask_rois)
            if sem_feat is not None and 'mask' in self.semantic_fusion:
                mask_feats = self._fuse_semantic(mask_feats, sem_feat,
                                                 mask_rois)
            flat_labels = nms_res.labels.reshape(-1)
            # single-image test chains last_feat through the info flow but
            # does NOT accumulate predictions (reference htc_roi_head.py
            # :432-441 — accumulation happens only in _mask_forward_test
            # used by aug_test); each stage's own sigmoid is averaged.
            last_feat = None
            stage_preds = []
            for stage in range(self.num_stages):
                if self.mask_info_flow:
                    pred, last_feat = self._mask_heads[stage](
                        mask_feats, last_feat, return_logits=True,
                        return_feat=True)
                else:
                    pred = self._mask_heads[stage](mask_feats)
                stage_preds.append(self._mask_heads[stage].get_mask_probs(
                    pred, flat_labels))
            probs = sum(stage_preds) / self.num_stages
            out['mask_probs'] = probs.reshape(
                b, max_out, probs.shape[1], probs.shape[2])
        return out
