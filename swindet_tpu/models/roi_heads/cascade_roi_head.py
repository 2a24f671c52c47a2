"""CascadeRoIHead — 3-stage refinement (reference:
mmdet/models/roi_heads/cascade_roi_head.py:13).

Train: per-stage assign/sample → bbox loss × stage weight → rois refined
by the predicted class's deltas (bg slots use argmax class, matching the
reference's refine_bboxes); GT-sourced slots are masked out of the next
stage's candidates (the reference removes pos_is_gt rois).

Test (reference :290-415): per-stage forward → regress_by_class with
argmax labels → classification scores averaged over stages → NMS with
the last stage's boxes → mask = mean sigmoid over the 3 stage mask heads
(merge_aug_masks semantics).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ..builder import (HEADS, build_assigner, build_head,
                       build_roi_extractor, build_sampler)
from ...core.nms import multiclass_nms


@HEADS.register_module()
class CascadeRoIHead(nn.Module):
    num_stages: int = 3
    stage_loss_weights: Sequence[float] = (1.0, 0.5, 0.25)
    bbox_roi_extractor: Optional[dict] = None
    bbox_head: Optional[Sequence[dict]] = None
    mask_roi_extractor: Optional[dict] = None
    mask_head: Optional[dict] = None
    shared_head: Optional[dict] = None
    train_cfg: Optional[Any] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        assert isinstance(self.bbox_head, (list, tuple))
        self._bbox_extractor = build_roi_extractor(
            dict(self.bbox_roi_extractor))
        self._bbox_heads = [
            build_head(dict(h, dtype=self.dtype, name=f'_bbox_head{i}'))
            for i, h in enumerate(self.bbox_head)]
        if self.mask_head is not None:
            mh = self.mask_head
            if isinstance(mh, (list, tuple)):
                self._mask_heads = [
                    build_head(dict(h, dtype=self.dtype,
                                    name=f'_mask_head{i}'))
                    for i, h in enumerate(mh)]
            else:
                # shared mask head config per stage (Swin cascade configs)
                self._mask_heads = [
                    build_head(dict(mh, dtype=self.dtype,
                                    name=f'_mask_head{i}'))
                    for i in range(self.num_stages)]
            ext = self.mask_roi_extractor or self.bbox_roi_extractor
            self._mask_extractor = build_roi_extractor(dict(ext))
        if self.train_cfg:
            stages = (list(self.train_cfg) if isinstance(
                self.train_cfg, (list, tuple)) else
                [self.train_cfg] * self.num_stages)
            self._assigners = [build_assigner(dict(c['assigner']))
                               for c in stages]
            self._samplers = [build_sampler(dict(c['sampler']))
                              for c in stages]
            self._stage_cfgs = [dict(c) for c in stages]

    @property
    def with_mask(self):
        return self.mask_head is not None

    def forward_dummy(self, feats, num_rois: int = 100):
        rois = jnp.concatenate([
            jnp.zeros((num_rois, 1)),
            jnp.tile(np.asarray([[0., 0., 32., 32.]], np.float32), (num_rois, 1)),
        ], axis=-1)
        outs = ()
        for head in self._bbox_heads:
            outs += head(self._bbox_extractor(feats, rois))
        if self.with_mask:
            mask_feats = self._mask_extractor(feats, rois)
            for mh in self._mask_heads:
                outs += (mh(mask_feats),)
        return outs

    # ---------------------------------------------------------------- train
    def forward_train(self, rng, feats, proposals, proposal_valid,
                      gt_bboxes, gt_valid, gt_labels, gt_masks,
                      img_shapes) -> Dict[str, jnp.ndarray]:
        b = proposals.shape[0]
        losses: Dict[str, jnp.ndarray] = {}
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
                [batch_col[:, None], samp.bboxes.reshape(-1, 4)], axis=-1)
            bbox_feats = self._bbox_extractor(feats, rois)
            cls_score, bbox_pred = head(bbox_feats, train=True)

            tgt = jax.vmap(lambda s: head.get_targets(
                s, self._stage_cfgs[stage]))(samp)
            labels, label_weights, bbox_targets, bbox_weights = \
                jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), tgt)
            stage_losses = head.loss(cls_score, bbox_pred, rois, labels,
                                     label_weights, bbox_targets,
                                     bbox_weights)
            for k, v in stage_losses.items():
                losses[f's{stage}.{k}'] = v * lw if 'loss' in k else v

            if self.with_mask:
                m = int(num * sampler.pos_fraction)
                pos_boxes = samp.bboxes[:, :m]
                pos_inds = samp.pos_gt_inds[:, :m]
                pos_mask = samp.is_pos[:, :m]
                pos_labels = jnp.clip(samp.pos_gt_labels[:, :m], 0)
                mask_rois = jnp.concatenate(
                    [jnp.repeat(np.arange(b, dtype=np.float32),
                                m)[:, None],
                     pos_boxes.reshape(-1, 4)], axis=-1)
                mask_feats = self._mask_extractor(feats, mask_rois)
                mask_pred = self._mask_heads[stage](mask_feats, train=True)
                mask_size = self._stage_cfgs[stage].get('mask_size', 28)
                targets = jax.vmap(
                    lambda gm, pb, pi: self._mask_heads[stage].get_targets(
                        gm, pb, pi, mask_size))(gt_masks, pos_boxes,
                                                pos_inds)
                mloss = self._mask_heads[stage].loss(
                    mask_pred, targets.reshape(-1, mask_size, mask_size),
                    pos_labels.reshape(-1),
                    pos_mask.reshape(-1).astype(jnp.float32))
                losses[f's{stage}.loss_mask'] = mloss['loss_mask'] * lw

            # refine rois for the next stage
            if stage < self.num_stages - 1:
                bg = head.num_classes
                roi_labels = labels
                cls_arg = jnp.argmax(cls_score[:, :-1], axis=-1)
                roi_labels = jnp.where(roi_labels == bg, cls_arg,
                                       roi_labels)
                img_shape_per_roi = jnp.repeat(img_shapes, num, axis=0)
                new_rois = head.regress_by_class(
                    rois, roi_labels, bbox_pred,
                    (img_shape_per_roi[:, 0:1], img_shape_per_roi[:, 1:2]))
                new_rois = jax.lax.stop_gradient(new_rois)
                cur_props = new_rois[:, 1:].reshape(b, num, 4)
                # drop gt-sourced positive slots (reference pos_is_gts)
                g = gt_bboxes.shape[1]
                is_gt_slot = (samp.inds < g) & samp.is_pos \
                    if sampler.add_gt_as_proposals else \
                    jnp.zeros_like(samp.is_pos)
                cur_valid = samp.valid & ~is_gt_slot
        return losses

    # ----------------------------------------------------------------- test
    def _ms_bbox_forward(self, feats, rois, img_shape_per_roi):
        """Multi-stage refinement loop shared by simple_test/bbox_test.
        Returns (softmaxed stage-averaged scores, refined rois, last
        stage's bbox_pred) — reference cascade_roi_head.py:305-336."""
        ms_scores = []
        bbox_pred = None
        for stage in range(self.num_stages):
            head = self._bbox_heads[stage]
            bbox_feats = self._bbox_extractor(feats, rois)
            cls_score, bbox_pred = head(bbox_feats)
            # raw logits averaged over stages, softmax AFTER (reference
            # cascade_roi_head.py:449 sum(ms_scores)/n → get_bboxes)
            ms_scores.append(cls_score.astype(jnp.float32))
            if stage < self.num_stages - 1:
                labels = jnp.argmax(cls_score[:, :-1], axis=-1)
                rois = head.regress_by_class(
                    rois, labels, bbox_pred,
                    (img_shape_per_roi[:, 0:1], img_shape_per_roi[:, 1:2]))
        avg_scores = jax.nn.softmax(sum(ms_scores) / self.num_stages,
                                    axis=-1)
        return avg_scores, rois, bbox_pred

    def bbox_test(self, feats, proposals, img_shapes):
        """Decoded per-proposal (scores, boxes) WITHOUT NMS/rescale — the
        per-aug half of aug_test (reference: cascade_roi_head.py:435-455
        aug_test bbox loop)."""
        b, p = proposals.shape[:2]
        batch_col = jnp.repeat(np.arange(b, dtype=np.float32), p)
        rois = jnp.concatenate(
            [batch_col[:, None], proposals.reshape(-1, 4)], axis=-1)
        img_shape_per_roi = jnp.repeat(img_shapes, p, axis=0)
        avg_scores, rois, bbox_pred = self._ms_bbox_forward(
            feats, rois, img_shape_per_roi)
        last = self._bbox_heads[-1]
        boxes = jax.vmap(
            lambda r, bp, sh: last._bbox_coder.decode(
                r[:, 1:], bp, max_shape=sh))(
            rois.reshape(b, p, 5), bbox_pred.reshape(b, p, -1),
            img_shapes)
        return avg_scores.reshape(b, p, -1), boxes

    def mask_test(self, feats, det_boxes, det_labels):
        """Stage-averaged own-class mask probs for given boxes (in the
        current image frame) — the per-aug half of aug_test masks
        (reference: cascade_roi_head.py:460-480)."""
        b, m = det_boxes.shape[:2]
        mask_rois = jnp.concatenate(
            [jnp.repeat(np.arange(b, dtype=np.float32), m)[:, None],
             det_boxes.reshape(-1, 4)], axis=-1)
        mask_feats = self._mask_extractor(feats, mask_rois)
        flat_labels = det_labels.reshape(-1)
        probs = 0.
        for stage in range(self.num_stages):
            mask_pred = self._mask_heads[stage](mask_feats)
            probs = probs + self._mask_heads[stage].get_mask_probs(
                mask_pred, flat_labels)
        probs = probs / self.num_stages
        return probs.reshape(b, m, probs.shape[1], probs.shape[2])

    def simple_test(self, feats, proposals, proposal_valid, img_shapes,
                    scale_factors, rescale: bool = True):
        cfg = dict(self.test_cfg)
        b, p = proposals.shape[:2]
        batch_col = jnp.repeat(np.arange(b, dtype=np.float32), p)
        rois = jnp.concatenate(
            [batch_col[:, None], proposals.reshape(-1, 4)], axis=-1)
        img_shape_per_roi = jnp.repeat(img_shapes, p, axis=0)

        avg_scores, rois, bbox_pred = self._ms_bbox_forward(
            feats, rois, img_shape_per_roi)
        last = self._bbox_heads[-1]

        rois_b = rois.reshape(b, p, 5)
        scores_b = avg_scores.reshape(b, p, -1)
        pred_b = jax.tree.map(lambda t: t.reshape(b, p, -1), bbox_pred)

        def per_image(r, s, bp, sh, sf, v):
            # the LAST stage's deltas are decoded on the twice-refined
            # rois (reference: cascade_roi_head.py:340 get_bboxes(rois,
            # cls_score, bbox_pred, ...)); SABL heads also return a
            # bucketing confidence used as NMS score factor
            boxes, score_factors = last.decode_for_test(r, bp, sh)
            if rescale:
                boxes = (boxes.reshape(boxes.shape[0], -1, 4) /
                         sf[None, None, :4]).reshape(boxes.shape)
            s = jnp.where(v[:, None], s, 0.0)
            return multiclass_nms(boxes, s, cfg['score_thr'],
                                  dict(cfg['nms']), cfg['max_per_img'],
                                  score_factors=score_factors)

        nms_res = jax.vmap(per_image)(rois_b, scores_b, pred_b, img_shapes,
                                      scale_factors, proposal_valid)
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
                 det_boxes.reshape(-1, 4)], axis=-1)
            mask_feats = self._mask_extractor(feats, mask_rois)
            flat_labels = nms_res.labels.reshape(-1)
            probs = 0.
            for stage in range(self.num_stages):
                mask_pred = self._mask_heads[stage](mask_feats)
                probs = probs + self._mask_heads[stage].get_mask_probs(
                    mask_pred, flat_labels)
            probs = probs / self.num_stages
            out['mask_probs'] = probs.reshape(
                b, max_out, probs.shape[1], probs.shape[2])
        return out
