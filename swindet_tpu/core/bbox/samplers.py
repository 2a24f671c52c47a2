"""Positive/negative sampling as static-shape masked top-k.

TPU-native re-design of the reference samplers (reference:
mmdet/core/bbox/samplers/random_sampler.py:8, base_sampler.py,
sampling_result.py). Dynamic ``nonzero`` + ``randperm`` become: every
candidate gets a uniform random key; candidates are ranked inside their
class (pos/neg) by key; selection = rank < expected count. The fixed-size
output (num slots + validity) replaces the reference's SamplingResult.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...registries import BBOX_SAMPLERS
from .assigners import AssignResult, add_gt_as_candidates


class SamplingResult(NamedTuple):
    """Fixed-size sample of ``num`` candidate slots.

    inds: (num,) int32 — index into the candidate set (gt-prepended when
        add_gt_as_proposals); distinct OUT-OF-RANGE values (>= candidate
        count) where ``valid`` is False, so scatters drop filler slots
        and gathers clamp.
    valid: (num,) bool
    is_pos: (num,) bool
    bboxes: (num, 4) gathered candidate boxes
    pos_gt_bboxes: (num, 4) matched gt box (zeros for neg/invalid)
    pos_gt_labels: (num,) int32 class label for positives; -1 elsewhere
    pos_gt_inds: (num,) int32 0-based gt index for positives; 0 elsewhere
    num_pos / num_neg: scalar int32 counts
    """
    inds: jnp.ndarray
    valid: jnp.ndarray
    is_pos: jnp.ndarray
    bboxes: jnp.ndarray
    pos_gt_bboxes: jnp.ndarray
    pos_gt_labels: jnp.ndarray
    pos_gt_inds: jnp.ndarray
    num_pos: jnp.ndarray
    num_neg: jnp.ndarray


def _ranked_select(mask: jnp.ndarray, keys: jnp.ndarray,
                   expected: jnp.ndarray, cap: int):
    """Select up to ``expected`` True entries of ``mask`` by descending
    key (static shapes). ``cap`` is a static upper bound on ``expected``
    (the sampler's slot count): selection = top-``cap`` by key, keep the
    first ``expected``. Ties break by lower index — identical to the
    rank-by-double-argsort formulation, but top-k of a small static k
    beats two full-set sorts on the RPN-sized (≈270k) anchor sets.

    Returns (sel_mask (n,), top_idx (cap,), taken (cap,)) — the latter
    two let the caller pack slots without another full-set top-k.
    """
    score = jnp.where(mask, keys, -jnp.inf)
    cap = min(cap, mask.shape[0])
    _, top_idx = jax.lax.top_k(score, cap)
    taken = (jnp.arange(cap) < expected) & jnp.take(mask, top_idx)
    sel = jnp.zeros(mask.shape, bool).at[top_idx].set(taken)
    return sel, top_idx.astype(jnp.int32), taken


@BBOX_SAMPLERS.register_module()
class RandomSampler:
    """Uniform random pos/neg sampling (reference: random_sampler.py:8)."""

    USE_HARDNESS = False

    def _pos_keys(self, rng, assign_result, pos_mask, n):
        """Selection priority for positives (higher = earlier)."""
        return jax.random.uniform(rng, (n,))

    def _neg_keys(self, rng, assign_result, neg_mask, n):
        return jax.random.uniform(rng, (n,))

    def __init__(self, num: int, pos_fraction: float,
                 neg_pos_ub: int = -1, add_gt_as_proposals: bool = True,
                 **kwargs):
        self.num = num
        self.pos_fraction = pos_fraction
        self.neg_pos_ub = neg_pos_ub
        self.add_gt_as_proposals = add_gt_as_proposals

    def sample(self,
               rng: jax.Array,
               assign_result: AssignResult,
               bboxes: jnp.ndarray,
               gt_bboxes: jnp.ndarray,
               gt_valid: jnp.ndarray,
               gt_labels: Optional[jnp.ndarray] = None,
               bbox_valid: Optional[jnp.ndarray] = None,
               hardness: Optional[jnp.ndarray] = None) -> SamplingResult:
        """Sample ``self.num`` slots from candidates.

        bboxes: (P, 4) proposals; when ``add_gt_as_proposals`` the candidate
        set becomes concat(gt_bboxes, bboxes) with gt trivially positive
        (reference: base_sampler.py:75-82).
        """
        if self.add_gt_as_proposals:
            assign_result = add_gt_as_candidates(assign_result, gt_valid,
                                                 gt_labels)
            cand_boxes = jnp.concatenate([gt_bboxes[:, :4], bboxes[:, :4]], 0)
        else:
            cand_boxes = bboxes[:, :4]
        n = cand_boxes.shape[0]
        gt_inds = assign_result.gt_inds

        pos_mask = gt_inds > 0
        neg_mask = gt_inds == 0
        if bbox_valid is not None:
            pad = jnp.ones((n - bbox_valid.shape[0],), bool)
            full_valid = jnp.concatenate([pad, bbox_valid]) \
                if self.add_gt_as_proposals else bbox_valid
            pos_mask &= full_valid
            neg_mask &= full_valid

        k_pos, k_neg, k_tie = jax.random.split(rng, 3)
        if self.USE_HARDNESS and hardness is not None:
            # OHEM: rank by per-candidate loss instead of random keys
            # (reference: ohem_sampler.py hard_mining — topk CE loss)
            keys_pos = keys_neg = hardness
        else:
            keys_pos = self._pos_keys(k_pos, assign_result, pos_mask, n)
            keys_neg = self._neg_keys(k_neg, assign_result, neg_mask, n)

        num_expected_pos = int(self.num * self.pos_fraction)
        sel_pos, pos_idx, pos_taken = _ranked_select(
            pos_mask, keys_pos, num_expected_pos, self.num)
        num_pos = jnp.sum(sel_pos).astype(jnp.int32)

        num_expected_neg = self.num - num_pos
        if self.neg_pos_ub >= 0:
            neg_ub = jnp.maximum(1, num_pos) * self.neg_pos_ub
            num_expected_neg = jnp.minimum(num_expected_neg, neg_ub)
        sel_neg, neg_idx, neg_taken = _ranked_select(
            neg_mask, keys_neg, num_expected_neg, self.num)
        num_neg = jnp.sum(sel_neg).astype(jnp.int32)

        # Pack selected entries into `num` fixed slots, positives first.
        # Every selected entry lives in pos_idx ∪ neg_idx (≤ 2·num
        # candidates), so the pack top-k runs on that small union, not
        # the full candidate set; tie noise is gathered from a full-set
        # uniform draw so slot order matches the key stream.
        cand_idx = jnp.concatenate([pos_idx, neg_idx])
        flags = jnp.concatenate([jnp.where(pos_taken, 3.0, 0.0),
                                 jnp.where(neg_taken, 2.0, 0.0)])
        noise = jax.random.uniform(k_tie, (n,))  # stable-ish shuffle
        pack = flags + jnp.take(noise, cand_idx)
        _, slot = jax.lax.top_k(pack, self.num)
        slot_taken = jnp.take(jnp.concatenate([pos_taken, neg_taken]), slot)
        # Invalid slots get distinct OUT-OF-RANGE indices (n + slot):
        # target-scatter consumers drop them (mode='drop'), gathers clamp.
        # In-range fillers could duplicate a selected index and clobber
        # its scattered target (the per-class top-k unions overlap).
        inds = jnp.where(slot_taken, jnp.take(cand_idx, slot),
                         n + slot).astype(jnp.int32)
        slot_sel_pos = slot_taken & (slot < pos_idx.shape[0])
        slot_sel_neg = slot_taken & (slot >= pos_idx.shape[0])
        valid = slot_sel_pos | slot_sel_neg

        sampled_boxes = jnp.take(cand_boxes, inds, axis=0)
        slot_gt = jnp.take(gt_inds, inds)                  # 1-based
        pos_gt_inds = jnp.where(slot_sel_pos, jnp.clip(slot_gt - 1, 0), 0)
        pos_gt_bboxes = jnp.take(gt_bboxes[:, :4], pos_gt_inds, axis=0)
        pos_gt_bboxes = jnp.where(slot_sel_pos[:, None], pos_gt_bboxes, 0.0)
        if gt_labels is not None:
            lab = jnp.take(gt_labels.astype(jnp.int32), pos_gt_inds)
            pos_gt_labels = jnp.where(slot_sel_pos, lab, -1)
        else:
            pos_gt_labels = jnp.full((self.num,), -1, jnp.int32)

        return SamplingResult(
            inds=inds, valid=valid, is_pos=slot_sel_pos,
            bboxes=sampled_boxes, pos_gt_bboxes=pos_gt_bboxes,
            pos_gt_labels=pos_gt_labels,
            pos_gt_inds=pos_gt_inds.astype(jnp.int32),
            num_pos=num_pos, num_neg=num_neg)


@BBOX_SAMPLERS.register_module()
class PseudoSampler:
    """No-op sampler: all positives + all negatives kept in place
    (reference: pseudo_sampler.py). Returns full-set masks rather than
    packed slots — used by single-stage heads whose loss runs on the full
    anchor set."""

    def __init__(self, **kwargs):
        pass

    def sample(self, rng, assign_result: AssignResult, bboxes, gt_bboxes,
               gt_valid, gt_labels=None, bbox_valid=None, **kwargs):
        n = bboxes.shape[0]
        pos_mask = assign_result.gt_inds > 0
        neg_mask = assign_result.gt_inds == 0
        if bbox_valid is not None:
            pos_mask &= bbox_valid
            neg_mask &= bbox_valid
        inds = jnp.arange(n, dtype=jnp.int32)
        pos_gt_inds = jnp.where(pos_mask,
                                jnp.clip(assign_result.gt_inds - 1, 0), 0)
        pos_gt_bboxes = jnp.take(gt_bboxes[:, :4], pos_gt_inds, axis=0)
        pos_gt_bboxes = jnp.where(pos_mask[:, None], pos_gt_bboxes, 0.0)
        if gt_labels is not None:
            lab = jnp.take(gt_labels.astype(jnp.int32), pos_gt_inds)
            labels = jnp.where(pos_mask, lab, -1)
        else:
            labels = jnp.full((n,), -1, jnp.int32)
        return SamplingResult(
            inds=inds, valid=pos_mask | neg_mask, is_pos=pos_mask,
            bboxes=bboxes[:, :4], pos_gt_bboxes=pos_gt_bboxes,
            pos_gt_labels=labels, pos_gt_inds=pos_gt_inds.astype(jnp.int32),
            num_pos=jnp.sum(pos_mask).astype(jnp.int32),
            num_neg=jnp.sum(neg_mask).astype(jnp.int32))


@BBOX_SAMPLERS.register_module()
class OHEMSampler(RandomSampler):
    """Online Hard Example Mining (reference: ohem_sampler.py:9).

    TPU-native: the RoI head computes per-candidate classification loss
    in a stop-gradient pre-pass over the FULL candidate set and hands
    it in as ``hardness``; selection becomes rank-by-loss instead of
    rank-by-random-key — the same top-k-loss set as the reference's
    ``loss.topk(num_expected)``, with static shapes.
    """

    USE_HARDNESS = True


def _interleaved_keys(rng, group_ids, mask, shares=None):
    """Priority keys that select members round-robin across groups:
    the r-th (random-order) member of each group outranks every
    (r+1)-th member. With ``shares`` the round-robin is weighted —
    a group with share s advances its rank counter at rate 1/s.

    Reproduces quota-per-group sampling (reference: Libra's
    sample_via_interval / InstanceBalancedPosSampler) with static
    shapes: top-k by these keys == per-group quotas + automatic
    redistribution when groups run short.
    """
    n = group_ids.shape[0]
    key = jax.random.uniform(rng, (n,))
    same = group_ids[:, None] == group_ids[None, :]
    mm = mask[:, None] & mask[None, :]
    within_rank = jnp.sum(same & mm & (key[None, :] > key[:, None]),
                          axis=1).astype(jnp.float32)
    if shares is not None:
        within_rank = within_rank / jnp.maximum(shares, 1e-6)
    return -within_rank + 0.5 * key


@BBOX_SAMPLERS.register_module()
class IoUBalancedNegSampler(RandomSampler):
    """Libra R-CNN IoU-balanced negative sampling (reference:
    iou_balanced_neg_sampler.py:9): negatives drawn evenly from
    ``num_bins`` IoU intervals above ``floor_thr``; sub-floor
    negatives fill a ``floor_fraction`` share (backfill-only when 0).
    """

    def __init__(self, num, pos_fraction, floor_thr: float = -1,
                 floor_fraction: float = 0, num_bins: int = 3, **kwargs):
        super().__init__(num, pos_fraction, **kwargs)
        self.floor_thr = floor_thr
        self.floor_fraction = floor_fraction
        self.num_bins = num_bins

    def _neg_keys(self, rng, assign_result, neg_mask, n):
        iou = assign_result.max_overlaps
        if iou.shape[0] != n:   # gt-prepended candidates
            iou = jnp.concatenate(
                [jnp.ones((n - iou.shape[0],)), iou])
        floor = max(self.floor_thr, 0.0)
        max_iou = jnp.maximum(jnp.max(jnp.where(neg_mask, iou, 0.0)),
                              floor + 1e-3)
        width = (max_iou - floor) / self.num_bins
        in_floor = iou < self.floor_thr if self.floor_thr > 0 else \
            (iou <= 0.0 if self.floor_thr == 0 else
             jnp.zeros_like(neg_mask))
        bin_id = jnp.clip(((iou - floor) / width).astype(jnp.int32),
                          0, self.num_bins - 1)
        # floor set = group -1 with its own share
        group = jnp.where(in_floor, -1, bin_id)
        iou_share = (1.0 - self.floor_fraction) / self.num_bins
        shares = jnp.where(in_floor,
                           max(self.floor_fraction, 1e-4), iou_share)
        return _interleaved_keys(rng, group, neg_mask, shares)


@BBOX_SAMPLERS.register_module()
class InstanceBalancedPosSampler(RandomSampler):
    """Equal positives per gt instance (reference:
    instance_balanced_pos_sampler.py:9)."""

    def _pos_keys(self, rng, assign_result, pos_mask, n):
        gt_inds = assign_result.gt_inds
        if gt_inds.shape[0] != n:
            g = n - gt_inds.shape[0]
            gt_inds = jnp.concatenate(
                [jnp.arange(1, g + 1, dtype=gt_inds.dtype), gt_inds])
        return _interleaved_keys(rng, gt_inds, pos_mask)


@BBOX_SAMPLERS.register_module()
class ScoreHLRSampler(RandomSampler):
    """Score-based hierarchical local ranking (reference:
    score_hlr_sampler.py:12, Libra-style hard mining by ranked scores).

    The RoI head's stop-gradient pre-pass computes the per-candidate
    HLR importance (max foreground score, NMS-Match grouping of the
    decoded boxes, two-level rank → importance) and hands it in as the
    ``hardness`` ranking key; sub-threshold negatives rank below every
    valid one (random backfill). The reference's negative label-weight
    decay (score_hlr_sampler.py:197-208) is applied by the RoI head via
    ``StandardRoIHead._score_hlr_label_weights`` (it needs the prepass
    CE losses, which live there).
    """

    USE_HARDNESS = True
    PREPASS = 'score_hlr'

    def __init__(self, num, pos_fraction, neg_pos_ub=-1,
                 add_gt_as_proposals=True, k: float = 0.5,
                 bias: float = 0, score_thr: float = 0.05,
                 iou_thr: float = 0.5, **kwargs):
        super().__init__(num, pos_fraction, neg_pos_ub,
                         add_gt_as_proposals)
        self.k = k
        self.bias = bias
        self.score_thr = score_thr
        self.iou_thr = iou_thr
