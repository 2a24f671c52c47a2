"""StandardRoIHead — Mask R-CNN second stage (reference:
mmdet/models/roi_heads/standard_roi_head.py:10).

Train: per-image assign+sample on padded proposals (vmapped), RoIAlign
over the batch-flattened fixed slots, bbox + mask losses. Mask branch
uses the first ``num*pos_fraction`` sampler slots — positives are packed
first, so this covers exactly the positive RoIs the reference trains on.

Test: padded proposals → bbox head → per-image multiclass NMS → mask
probs for the kept detections. All under jit; mask pasting at the host
boundary.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ..builder import (HEADS, build_assigner, build_from_cfg, build_head,
                       build_roi_extractor, build_sampler)
from ...core.bbox.samplers import SamplingResult


@HEADS.register_module()
class StandardRoIHead(nn.Module):
    bbox_roi_extractor: Optional[dict] = None
    bbox_head: Optional[dict] = None
    mask_roi_extractor: Optional[dict] = None
    mask_head: Optional[dict] = None
    shared_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        if self.bbox_head is not None:
            self._bbox_extractor = build_roi_extractor(
                dict(self.bbox_roi_extractor))
            self._bbox_head = build_head(
                dict(self.bbox_head, dtype=self.dtype))
        if self.mask_head is not None:
            ext = self.mask_roi_extractor or self.bbox_roi_extractor
            self._mask_extractor = build_roi_extractor(dict(ext))
            self._mask_head = build_head(
                dict(self.mask_head, dtype=self.dtype))
        if self.shared_head is not None:
            from ..builder import build_shared_head
            self._shared_head = build_shared_head(
                dict(self.shared_head, dtype=self.dtype))
        if self.train_cfg:
            self._assigner = build_assigner(dict(self.train_cfg['assigner']))
            self._sampler = build_sampler(dict(self.train_cfg['sampler']))

    @property
    def with_mask(self):
        return self.mask_head is not None

    def _bbox_forward(self, feats, rois, train: bool = False):
        """RoI features -> (cls_score, bbox_pred). Single override
        point for variants (DoubleHead scales the reg rois)."""
        x = self._bbox_extractor(feats, rois)
        if self.shared_head is not None:
            # C4-style res-layer shared head (reference:
            # shared_heads/res_layer.py; _base_/models/
            # faster_rcnn_r50_caffe_c4.py)
            x = self._shared_head(x, train=train)
        return self._bbox_head(x, train=train)

    def _mask_feats(self, feats, rois, train: bool = False):
        """Mask-branch RoI features; C4-style heads route them through
        the shared ResLayer too (reference standard_roi_head.py
        _mask_forward: `if self.with_shared_head`)."""
        x = self._mask_extractor(feats, rois)
        if self.shared_head is not None:
            x = self._shared_head(x, train=train)
        return x

    def forward_dummy(self, feats, num_rois: int = 100):
        """Touch all parameters (init / FLOPs)."""
        rois = jnp.concatenate([
            jnp.zeros((num_rois, 1)),
            jnp.tile(np.asarray([[0., 0., 32., 32.]], np.float32), (num_rois, 1)),
        ], axis=-1)
        outs = self._bbox_forward(feats, rois)
        if self.with_mask:
            outs += (self._mask_head(self._mask_feats(feats, rois)),)
        return outs

    # ----------------------------------------------------------------- ohem
    def _ohem_hardness(self, feats, proposals, gt_bboxes, gt_valid,
                       gt_labels, proposal_valid):
        """Per-candidate classification loss for OHEM ranking
        (reference: ohem_sampler.py:30 hard_mining — a no-grad bbox
        forward over the candidate set + CE vs assigned labels).
        Candidate layout matches the sampler: [gt | proposals]."""
        b, p = proposals.shape[:2]
        if self._sampler.add_gt_as_proposals:
            cands = jnp.concatenate([gt_bboxes[:, :, :4], proposals], 1)
        else:
            cands = proposals
        n = cands.shape[1]

        def assign_labels(props, pvalid, gb, gv, gl):
            assign = self._assigner.assign(props, gb, gv, gl,
                                           bbox_valid=pvalid)
            if self._sampler.add_gt_as_proposals:
                from ...core.bbox.assigners import add_gt_as_candidates
                assign = add_gt_as_candidates(assign, gv, gl)
            pos = assign.gt_inds > 0
            return jnp.where(pos, jnp.clip(assign.labels, 0),
                             self._bbox_head.num_classes)

        labels = jax.vmap(assign_labels)(
            proposals, proposal_valid, gt_bboxes, gt_valid, gt_labels)

        batch_col = jnp.repeat(np.arange(b, dtype=np.float32), n)
        rois = jnp.concatenate(
            [batch_col[:, None], cands.reshape(-1, 4)], axis=-1)
        cls_score, _ = self._bbox_forward(feats, rois)
        cls_score = jax.lax.stop_gradient(
            cls_score.astype(jnp.float32))
        logp = jax.nn.log_softmax(cls_score, axis=-1)
        ce = -jnp.take_along_axis(
            logp, labels.reshape(-1)[:, None], axis=-1)[:, 0]
        return ce.reshape(b, n)

    def _score_hlr_priority(self, feats, proposals, gt_bboxes,
                            proposal_valid):
        """Per-candidate Score-HLR importance (reference:
        score_hlr_sampler.py:128 _sample_neg, stop-gradient).

        Returns (imp, ce_bg): importance per candidate (-1e4 sentinel
        for sub-threshold) and the per-candidate background CE loss
        (reference's ``ori_loss``) used to normalise the negative
        label-weight decay."""
        from ...core.nms import nms_match
        b, p = proposals.shape[:2]
        if self._sampler.add_gt_as_proposals:
            cands = jnp.concatenate([gt_bboxes[:, :, :4], proposals], 1)
        else:
            cands = proposals
        n = cands.shape[1]
        batch_col = jnp.repeat(np.arange(b, dtype=np.float32), n)
        rois = jnp.concatenate(
            [batch_col[:, None], cands.reshape(-1, 4)], axis=-1)
        cls_score, bbox_pred = self._bbox_forward(feats, rois)
        cls_score = jax.lax.stop_gradient(cls_score.astype(jnp.float32))
        bbox_pred = jax.lax.stop_gradient(bbox_pred.astype(jnp.float32))
        logp = jax.nn.log_softmax(cls_score, axis=-1)
        ce_bg = -logp[:, -1]          # CE vs background label (:141)
        probs = jnp.exp(logp)[:, :-1]
        max_score = probs.max(-1)
        arg = probs.argmax(-1)
        k = bbox_pred.shape[-1] // 4
        sel_pred = jnp.take_along_axis(
            bbox_pred.reshape(-1, k, 4),
            jnp.clip(arg, 0, k - 1)[:, None, None].repeat(4, -1),
            axis=1)[:, 0]
        decoded = self._bbox_head._bbox_coder.decode(rois[:, 1:],
                                                     sel_pred)
        dets = jnp.concatenate([decoded, max_score[:, None]], -1)
        thr_ok = max_score > self._sampler.score_thr

        def per_image(dets_i, ok_i):
            group = nms_match(dets_i, self._sampler.iou_thr, valid=ok_i)
            score = dets_i[:, 4]
            same = (group[:, None] == group[None, :]) & (group[:, None]
                                                         >= 0)
            rank = jnp.sum(same & (score[None, :] > score[:, None]),
                           axis=1).astype(jnp.float32)
            n_valid = jnp.sum(ok_i).astype(jnp.float32)
            imp = jnp.where(ok_i, n_valid - rank + score, -1e4)
            return imp

        imp = jax.vmap(per_image)(
            dets.reshape(b, n, 5),
            thr_ok.reshape(b, n))
        return imp, ce_bg.reshape(b, n)

    def _score_hlr_label_weights(self, samp, imp, ce_bg, cand_neg):
        """Negative label-weight decay (reference:
        score_hlr_sampler.py:197-208): HLR-selected negatives get
        ``((up_bound - imp_rank)/up_bound)`` mapped through
        ``(bias + (1-bias)*w)**k`` and renormalised so the summed
        background CE is unchanged. Returns (B, num) weights (1 for
        positives/invalid slots)."""
        k_pow = self._sampler.k
        bias = self._sampler.bias

        def per_image(s, imp_i, ce_i, neg_i):
            valid_cand = (imp_i > -1e3) & neg_i   # thr_ok negatives
            # rank of each valid negative by importance descending;
            # everything else sorts last so valid ranks are compact
            imp_m = jnp.where(valid_cand, imp_i, -jnp.inf)
            order = jnp.argsort(-imp_m)
            rank = jnp.argsort(order).astype(jnp.float32)
            neg_slot = s.valid & ~s.is_pos
            slot_rank = jnp.take(rank, s.inds)
            slot_hlr = jnp.take(valid_cand, s.inds) & neg_slot
            num_valid = jnp.sum(valid_cand).astype(jnp.float32)
            num_expected = jnp.sum(neg_slot).astype(jnp.float32)
            up = jnp.maximum(jnp.maximum(num_expected, num_valid), 1.0)
            w_hlr = (up - slot_rank) / up
            # random-backfilled (sub-threshold) negatives get the
            # minimum HLR weight (:201)
            wmin = jnp.min(jnp.where(slot_hlr, w_hlr, jnp.inf))
            wmin = jnp.where(jnp.isfinite(wmin), wmin, 1.0)
            w = jnp.where(slot_hlr, w_hlr, wmin)
            w = (bias + (1.0 - bias) * w) ** k_pow
            slot_loss = jnp.take(ce_i, s.inds)
            denom = jnp.sum(jnp.where(neg_slot, slot_loss * w, 0.0))
            numer = jnp.sum(jnp.where(neg_slot, slot_loss, 0.0))
            norm = jnp.where(denom > 0, numer / denom, 1.0)
            w = w * norm
            return jnp.where(neg_slot, w, 1.0)

        return jax.vmap(per_image)(samp, imp, ce_bg, cand_neg)

    # ---------------------------------------------------------------- train
    def forward_train(self, rng, feats, proposals, proposal_valid,
                      gt_bboxes, gt_valid, gt_labels, gt_masks,
                      img_shapes) -> Dict[str, jnp.ndarray]:
        """feats: per-level (B, H, W, C); proposals: (B, P, 4);
        gt_bboxes: (B, G, 4); gt_masks: (B, G, Hpad, Wpad) or None."""
        losses, _ = self._forward_train_impl(
            rng, feats, proposals, proposal_valid, gt_bboxes, gt_valid,
            gt_labels, gt_masks, img_shapes)
        return losses

    def _forward_train_impl(self, rng, feats, proposals, proposal_valid,
                            gt_bboxes, gt_valid, gt_labels, gt_masks,
                            img_shapes, return_mask_aux: bool = False):
        b, p = proposals.shape[:2]
        num = self._sampler.num

        hardness = None
        hlr_ce_bg = None
        if getattr(self._sampler, 'USE_HARDNESS', False):
            if getattr(self._sampler, 'PREPASS', 'ohem') == 'score_hlr':
                hardness, hlr_ce_bg = self._score_hlr_priority(
                    feats, proposals, gt_bboxes, proposal_valid)
            else:
                hardness = self._ohem_hardness(
                    feats, proposals, gt_bboxes, gt_valid, gt_labels,
                    proposal_valid)

        def assign_sample(r, props, pvalid, gb, gv, gl, hard):
            assign = self._assigner.assign(props, gb, gv, gl,
                                           bbox_valid=pvalid)
            samp = self._sampler.sample(r, assign, props, gb, gv, gl,
                                        bbox_valid=pvalid, hardness=hard)
            # candidate-level negative mask in the (gt-prepended)
            # candidate frame samp.inds indexes into
            neg = (assign.gt_inds == 0) & pvalid
            if self._sampler.add_gt_as_proposals:
                neg = jnp.concatenate(
                    [jnp.zeros((gb.shape[0],), bool), neg])
            return samp, neg

        rngs = jax.random.split(rng, b)
        samp, cand_neg = jax.vmap(assign_sample)(
            rngs, proposals, proposal_valid, gt_bboxes, gt_valid,
            gt_labels,
            hardness if hardness is not None
            else jnp.zeros((b, 1)))

        # rois (B*num, 5) with batch index col
        batch_col = jnp.repeat(np.arange(b, dtype=np.float32), num)
        rois = jnp.concatenate(
            [batch_col[:, None], samp.bboxes.reshape(-1, 4)], axis=-1)

        losses = {}
        cls_score, bbox_pred = self._bbox_forward(feats, rois, train=True)

        tgt = jax.vmap(lambda s: self._bbox_head.get_targets(
            s, dict(self.train_cfg)))(samp)
        labels, label_weights, bbox_targets, bbox_weights = \
            jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), tgt)
        if hlr_ce_bg is not None:
            neg_w = self._score_hlr_label_weights(samp, hardness,
                                                  hlr_ce_bg, cand_neg)
            label_weights = label_weights * neg_w.reshape(-1)
        losses.update(self._bbox_head.loss(
            cls_score, bbox_pred, rois, labels, label_weights,
            bbox_targets, bbox_weights))

        if self.with_mask and gt_masks is not None:
            m = int(num * self._sampler.pos_fraction)
            # positives are packed first in sampler slots
            pos_boxes = samp.bboxes[:, :m]                     # (B, M, 4)
            pos_inds = samp.pos_gt_inds[:, :m]
            pos_mask = samp.is_pos[:, :m]
            pos_labels = jnp.clip(samp.pos_gt_labels[:, :m], 0)

            mask_rois = jnp.concatenate(
                [jnp.repeat(np.arange(b, dtype=np.float32), m)[:, None],
                 pos_boxes.reshape(-1, 4)], axis=-1)
            mask_feats = self._mask_feats(feats, mask_rois, train=True)
            mask_pred = self._mask_head(mask_feats, train=True)

            mask_size = self.train_cfg.get('mask_size', 28)
            targets = jax.vmap(
                lambda gm, pb, pi: self._mask_head.get_targets(
                    gm, pb, pi, mask_size))(gt_masks, pos_boxes, pos_inds)
            losses.update(self._mask_head.loss(
                mask_pred, targets.reshape(-1, mask_size, mask_size),
                pos_labels.reshape(-1),
                pos_mask.reshape(-1).astype(jnp.float32)))
            if return_mask_aux:
                return losses, (mask_feats, mask_pred, targets,
                                pos_boxes, pos_inds, pos_mask,
                                pos_labels)
        return losses, None

    # ----------------------------------------------------------------- test
    def bbox_test(self, feats, proposals, img_shapes):
        """Decoded per-proposal (scores (B,P,C+1), boxes (B,P,4k))
        WITHOUT NMS/rescale — the per-aug half of aug_test (reference:
        test_mixins.py:118 aug_test_bboxes calls get_bboxes(cfg=None))."""
        b, p = proposals.shape[:2]
        batch_col = jnp.repeat(np.arange(b, dtype=np.float32), p)
        rois = jnp.concatenate(
            [batch_col[:, None], proposals.reshape(-1, 4)], axis=-1)
        cls_score, bbox_pred = self._bbox_forward(feats, rois)
        scores = jax.nn.softmax(
            cls_score.astype(jnp.float32), axis=-1).reshape(b, p, -1)
        coder = self._bbox_head._bbox_coder
        boxes = jax.vmap(
            lambda r, bp, sh: coder.decode(r[:, 1:], bp, max_shape=sh))(
            rois.reshape(b, p, 5), bbox_pred.reshape(b, p, -1),
            img_shapes)
        return scores, boxes

    def mask_test(self, feats, det_boxes, det_labels):
        """Own-class mask probs for given boxes (current image frame) —
        the per-aug half of aug_test masks (test_mixins.py:238)."""
        b, m = det_boxes.shape[:2]
        mask_rois = jnp.concatenate(
            [jnp.repeat(np.arange(b, dtype=np.float32), m)[:, None],
             det_boxes.reshape(-1, 4)], axis=-1)
        mask_pred = self._mask_head(self._mask_feats(feats, mask_rois))
        probs = self._mask_head.get_mask_probs(mask_pred,
                                               det_labels.reshape(-1))
        return probs.reshape(b, m, probs.shape[1], probs.shape[2])

    def simple_test(self, feats, proposals, proposal_valid, img_shapes,
                    scale_factors, rescale: bool = True):
        """Returns dict with padded dets (B, max, 5), labels (B, max),
        det_valid (B, max), and mask probs (B, max, 2s, 2s) if with_mask."""
        cfg = dict(self.test_cfg)
        b, p = proposals.shape[:2]
        batch_col = jnp.repeat(np.arange(b, dtype=np.float32), p)
        rois = jnp.concatenate(
            [batch_col[:, None], proposals.reshape(-1, 4)], axis=-1)
        cls_score, bbox_pred = self._bbox_forward(feats, rois)

        cls_score = cls_score.reshape(b, p, -1)
        # with_reg=False bbox heads (Grid R-CNN) emit no deltas; SABL
        # emits a (bucket_cls, bucket_offset) tuple — reshape per leaf
        bbox_pred = (jax.tree.map(lambda t: t.reshape(b, p, -1), bbox_pred)
                     if bbox_pred is not None else None)
        rois = rois.reshape(b, p, 5)

        nms_res = jax.vmap(
            lambda r, c, bp, sh, sf, v: self._bbox_head.get_bboxes(
                r, c, bp if bbox_pred is not None else None, sh, sf,
                rescale, cfg, roi_valid=v))(
                rois, cls_score,
                bbox_pred if bbox_pred is not None else rois,
                img_shapes, scale_factors, proposal_valid)
        out = dict(dets=nms_res.dets, labels=nms_res.labels,
                   det_valid=nms_res.valid)

        if self.with_mask:
            max_out = nms_res.dets.shape[1]
            det_boxes = nms_res.dets[..., :4]
            if rescale:  # masks RoIAlign runs at input scale
                det_boxes = det_boxes * scale_factors[:, None, :4]
            mask_rois = jnp.concatenate(
                [jnp.repeat(np.arange(b, dtype=np.float32),
                            max_out)[:, None],
                 det_boxes.reshape(-1, 4)], axis=-1)
            mask_feats = self._mask_feats(feats, mask_rois)
            mask_pred = self._mask_head(mask_feats)
            probs = self._mask_head.get_mask_probs(
                mask_pred, nms_res.labels.reshape(-1))
            out['mask_probs'] = probs.reshape(
                b, max_out, probs.shape[1], probs.shape[2])
        return out


@HEADS.register_module()
class TridentRoIHead(StandardRoIHead):
    """(reference: roi_heads/trident_roi_head.py:11). With the
    TPU-native single-branch test path (TridentResNet emits only
    ``test_branch_idx`` at inference) the branch-merging NMS of the
    reference reduces to the standard test path; train-time branches
    arrive pre-folded into the batch axis."""
    num_branch: int = 3
    test_branch_idx: int = 1
