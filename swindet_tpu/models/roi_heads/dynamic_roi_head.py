"""Dynamic R-CNN (reference: mmdet/models/roi_heads/
dynamic_roi_head.py:14, arXiv:2004.06002): the RCNN IoU threshold and
SmoothL1 beta adapt to the training-time proposal statistics.

TPU-native: the reference's host-side Python history lists become a
fixed circular buffer in a flax ``dynamic`` variable collection that
lives INSIDE the jitted train step (it rides model_state through
TrainState). Every ``update_iter_interval`` steps the threshold
becomes the buffer mean (IoU) / median (beta) — the exact statistics
the reference computes, with no host round-trip.
"""
from __future__ import annotations

from typing import Dict

import jax
import numpy as np
import jax.numpy as jnp

from ..builder import HEADS
from ...core.bbox.samplers import SamplingResult
from .standard_roi_head import StandardRoIHead

EPS = 1e-15


@HEADS.register_module()
class DynamicRoIHead(StandardRoIHead):

    def setup(self):
        super().setup()
        d = dict(dict(self.train_cfg or {}).get('dynamic_rcnn', {}))
        self._iou_topk = int(d.get('iou_topk', 75))
        self._beta_topk = int(d.get('beta_topk', 10))
        self._interval = int(d.get('update_iter_interval', 100))
        self._initial_iou = float(d.get('initial_iou', 0.4))
        self._initial_beta = float(d.get('initial_beta', 1.0))
        self.v_iou = self.variable(
            'dynamic', 'iou_thr',
            lambda: jnp.asarray(self._initial_iou, jnp.float32))
        self.v_beta = self.variable(
            'dynamic', 'beta',
            lambda: jnp.asarray(self._initial_beta, jnp.float32))
        self.v_iou_hist = self.variable(
            'dynamic', 'iou_hist',
            lambda: jnp.zeros((self._interval,), jnp.float32))
        self.v_beta_hist = self.variable(
            'dynamic', 'beta_hist',
            lambda: jnp.zeros((self._interval,), jnp.float32))
        self.v_count = self.variable(
            'dynamic', 'count', lambda: jnp.zeros((), jnp.int32))

    def forward_train(self, rng, feats, proposals, proposal_valid,
                      gt_bboxes, gt_valid, gt_labels, gt_masks,
                      img_shapes) -> Dict[str, jnp.ndarray]:
        b, p = proposals.shape[:2]
        num = self._sampler.num
        iou_thr = self.v_iou.value
        beta = self.v_beta.value

        def assign_sample(r, props, pvalid, gb, gv, gl):
            assign = self._assigner.assign(
                props, gb, gv, gl, bbox_valid=pvalid,
                pos_iou_thr=iou_thr, neg_iou_thr=iou_thr,
                min_pos_iou=iou_thr)
            # record the iou_topk-th largest IoU over VALID proposals
            # only, clamping k to the valid count like the reference's
            # min(iou_topk, len(max_overlaps)) (reference :76); padded
            # slots would otherwise bias the threshold low.
            ov = jnp.where(pvalid, assign.max_overlaps, -jnp.inf)
            k = min(self._iou_topk, ov.shape[0])
            top, _ = jax.lax.top_k(ov, k)
            n_valid = jnp.sum(pvalid).astype(jnp.int32)
            kth_idx = jnp.clip(jnp.minimum(k, n_valid) - 1, 0)
            kth = jnp.where(n_valid > 0, top[kth_idx], 0.0)
            samp = self._sampler.sample(r, assign, props, gb, gv, gl,
                                        bbox_valid=pvalid)
            return samp, kth

        rngs = jax.random.split(rng, b)
        samp, kth_iou = jax.vmap(assign_sample)(
            rngs, proposals, proposal_valid, gt_bboxes, gt_valid,
            gt_labels)
        cur_iou = jnp.mean(kth_iou)

        batch_col = jnp.repeat(np.arange(b, dtype=np.float32), num)
        rois = jnp.concatenate(
            [batch_col[:, None], samp.bboxes.reshape(-1, 4)], axis=-1)

        losses = {}
        cls_score, bbox_pred = self._bbox_forward(feats, rois,
                                                  train=True)
        tgt = jax.vmap(lambda s: self._bbox_head.get_targets(
            s, dict(self.train_cfg)))(samp)
        labels, label_weights, bbox_targets, bbox_weights = \
            jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), tgt)

        # record the (beta_topk * B)-th smallest |dx,dy| mean of the
        # positives (reference :116-124)
        pos = bbox_weights[:, 0] > 0
        tgt_mag = jnp.mean(jnp.abs(bbox_targets[:, :2]), axis=1)
        tgt_mag = jnp.where(pos, tgt_mag, jnp.inf)
        k_beta = self._beta_topk * b
        small, _ = jax.lax.top_k(-tgt_mag, k_beta)
        num_pos = jnp.sum(pos)
        kth = jnp.clip(jnp.minimum(k_beta, num_pos) - 1, 0)
        cur_beta = -small[kth]
        cur_beta = jnp.where(jnp.isfinite(cur_beta), cur_beta,
                             self._initial_beta)

        losses.update(self._bbox_head.loss(
            cls_score, bbox_pred, rois, labels, label_weights,
            bbox_targets, bbox_weights,
            loss_bbox_kwargs=dict(beta=beta)))

        if self.with_mask and gt_masks is not None:
            m = int(num * self._sampler.pos_fraction)
            pos_boxes = samp.bboxes[:, :m]
            pos_inds = samp.pos_gt_inds[:, :m]
            pos_mask = samp.is_pos[:, :m]
            pos_labels = jnp.clip(samp.pos_gt_labels[:, :m], 0)
            mask_rois = jnp.concatenate(
                [jnp.repeat(np.arange(b, dtype=np.float32), m)[:, None],
                 pos_boxes.reshape(-1, 4)], axis=-1)
            mask_feats = self._mask_extractor(feats, mask_rois)
            mask_pred = self._mask_head(mask_feats, train=True)
            mask_size = self.train_cfg.get('mask_size', 28)
            targets = jax.vmap(
                lambda gm, pb, pi: self._mask_head.get_targets(
                    gm, pb, pi, mask_size))(gt_masks, pos_boxes, pos_inds)
            losses.update(self._mask_head.loss(
                mask_pred, targets.reshape(-1, mask_size, mask_size),
                pos_labels.reshape(-1),
                pos_mask.reshape(-1).astype(jnp.float32)))

        # ---- hyperparameter update (reference update_hyperparameters)
        if not self.is_initializing():
            cnt = self.v_count.value
            slot = jnp.mod(cnt, self._interval)
            iou_hist = self.v_iou_hist.value.at[slot].set(cur_iou)
            beta_hist = self.v_beta_hist.value.at[slot].set(cur_beta)
            cnt = cnt + 1
            do_update = jnp.mod(cnt, self._interval) == 0
            new_iou = jnp.maximum(self._initial_iou,
                                  jnp.mean(iou_hist))
            med_beta = jnp.median(beta_hist)
            new_beta = jnp.where(med_beta < EPS, self.v_beta.value,
                                 jnp.minimum(self._initial_beta,
                                             med_beta))
            self.v_iou.value = jnp.where(do_update, new_iou,
                                         self.v_iou.value)
            self.v_beta.value = jnp.where(do_update, new_beta,
                                          self.v_beta.value)
            self.v_iou_hist.value = iou_hist
            self.v_beta_hist.value = beta_hist
            self.v_count.value = cnt
            losses['dynamic_iou_thr'] = self.v_iou.value
            losses['dynamic_beta'] = self.v_beta.value
        return losses
