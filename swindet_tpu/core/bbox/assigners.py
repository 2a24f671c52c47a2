"""Box-to-GT assignment as fixed-size masked ops.

TPU-native re-design of the reference assigners (reference:
mmdet/core/bbox/assigners/max_iou_assigner.py:10, assign:60,
assign_wrt_overlaps:127). Instead of filtering to dynamic subsets, every
anchor keeps its slot: GT boxes arrive padded to a static ``G`` with a
``gt_valid`` mask and invalid rows/columns are masked to -1 overlap, which
reproduces the reference's subset semantics exactly.

Conventions for ``AssignResult``:
    gt_inds: (N,) int32 — -1 ignore, 0 negative, g+1 assigned to gt g
    max_overlaps: (N,) float
    labels: (N,) int32 — class label for positives, -1 elsewhere
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...registries import BBOX_ASSIGNERS
from .iou import bbox_overlaps


class AssignResult(NamedTuple):
    gt_inds: jnp.ndarray
    max_overlaps: jnp.ndarray
    labels: jnp.ndarray


@BBOX_ASSIGNERS.register_module()
class MaxIoUAssigner:
    """4-step max-IoU assignment incl. ``match_low_quality`` gt-nearest
    override and ignore-region suppression, vectorised over padded GT.

    The reference loops gts in order for low-quality matching so later gts
    override earlier ones (max_iou_assigner.py:127, gt_max_assign_all);
    here the *last* eligible gt per anchor is selected, matching that.
    """

    def __init__(self,
                 pos_iou_thr: float,
                 neg_iou_thr: Union[float, Tuple[float, float]],
                 min_pos_iou: float = 0.,
                 gt_max_assign_all: bool = True,
                 ignore_iof_thr: float = -1,
                 ignore_wrt_candidates: bool = True,
                 match_low_quality: bool = True,
                 gpu_assign_thr: int = -1,
                 iou_calculator: Optional[dict] = None):
        self.pos_iou_thr = pos_iou_thr
        self.neg_iou_thr = neg_iou_thr
        self.min_pos_iou = min_pos_iou
        self.gt_max_assign_all = gt_max_assign_all
        self.ignore_iof_thr = ignore_iof_thr
        self.ignore_wrt_candidates = ignore_wrt_candidates
        self.match_low_quality = match_low_quality

    def assign(self,
               bboxes: jnp.ndarray,
               gt_bboxes: jnp.ndarray,
               gt_valid: jnp.ndarray,
               gt_labels: Optional[jnp.ndarray] = None,
               bbox_valid: Optional[jnp.ndarray] = None,
               gt_bboxes_ignore: Optional[jnp.ndarray] = None,
               gt_ignore_valid: Optional[jnp.ndarray] = None,
               pos_iou_thr=None, neg_iou_thr=None,
               min_pos_iou=None, overlaps=None) -> AssignResult:
        """Assign each of N bboxes to one of G (padded) gt boxes.
        The threshold overrides accept traced scalars (Dynamic R-CNN's
        adaptive IoU threshold).

        Args:
            bboxes: (N, 4)
            gt_bboxes: (G, 4) padded
            gt_valid: (G,) bool
            gt_labels: (G,) int or None
            bbox_valid: (N,) bool — anchors outside allowed border; invalid
                anchors keep gt_inds == -1 (their overlaps are masked).
            overlaps: optional precomputed (N, G) matrix (ApproxMaxIoU
                passes the per-square max over its approx group).
        """
        n = bboxes.shape[0]
        if overlaps is None:
            overlaps = bbox_overlaps(bboxes, gt_bboxes)      # (N, G)
        overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
        if bbox_valid is not None:
            overlaps = jnp.where(bbox_valid[:, None], overlaps, -1.0)

        # Ignore-region suppression (reference :107-117): anchors heavily
        # overlapping an ignore region get all overlaps set to -1.
        if (self.ignore_iof_thr > 0 and gt_bboxes_ignore is not None
                and gt_bboxes_ignore.shape[0] > 0):
            if self.ignore_wrt_candidates:
                iof = bbox_overlaps(bboxes, gt_bboxes_ignore, mode='iof')
            else:
                iof = bbox_overlaps(gt_bboxes_ignore, bboxes, mode='iof').T
            if gt_ignore_valid is not None:
                iof = jnp.where(gt_ignore_valid[None, :], iof, -1.0)
            ignored = jnp.max(iof, axis=1, initial=-1.0) > self.ignore_iof_thr
            overlaps = jnp.where(ignored[:, None], -1.0, overlaps)

        max_overlaps = jnp.max(overlaps, axis=1, initial=-1.0)   # (N,)
        argmax_gt = jnp.argmax(overlaps, axis=1)                 # (N,)

        p_thr = self.pos_iou_thr if pos_iou_thr is None else pos_iou_thr
        n_thr = self.neg_iou_thr if neg_iou_thr is None else neg_iou_thr
        m_thr = self.min_pos_iou if min_pos_iou is None else min_pos_iou
        gt_inds = jnp.full((n,), -1, jnp.int32)
        # step 2: negatives
        if isinstance(n_thr, (tuple, list)):
            lo, hi = n_thr
            neg = (max_overlaps >= lo) & (max_overlaps < hi)
        else:
            neg = (max_overlaps >= 0) & (max_overlaps < n_thr)
        gt_inds = jnp.where(neg, 0, gt_inds)
        # step 3: positives
        pos = max_overlaps >= p_thr
        gt_inds = jnp.where(pos, argmax_gt.astype(jnp.int32) + 1, gt_inds)

        # step 4: low-quality match — each gt claims its best anchor(s)
        if self.match_low_quality:
            gt_max = jnp.max(overlaps, axis=0, initial=-1.0)     # (G,)
            eligible = ((overlaps == gt_max[None, :])
                        & (gt_max[None, :] >= m_thr)
                        & (gt_max[None, :] > -1.0)
                        & gt_valid[None, :])
            if not self.gt_max_assign_all:
                # only the single best anchor per gt (first occurrence)
                best_anchor = jnp.argmax(overlaps, axis=0)
                row_ids = jnp.arange(n)[:, None]
                eligible = eligible & (row_ids == best_anchor[None, :])
            g = gt_bboxes.shape[0]
            # last eligible gt wins (reference's in-order overwrite)
            rev = eligible[:, ::-1]
            last_g = g - 1 - jnp.argmax(rev, axis=1)
            has = jnp.any(eligible, axis=1)
            gt_inds = jnp.where(has, last_g.astype(jnp.int32) + 1, gt_inds)

        if bbox_valid is not None:
            gt_inds = jnp.where(bbox_valid, gt_inds, -1)

        if gt_labels is not None:
            safe = jnp.clip(gt_inds - 1, 0, None)
            labels = jnp.where(gt_inds > 0,
                               jnp.take(gt_labels, safe, axis=0), -1)
        else:
            labels = jnp.full((n,), -1, jnp.int32)
        return AssignResult(gt_inds=gt_inds, max_overlaps=max_overlaps,
                            labels=labels.astype(jnp.int32))


def add_gt_as_candidates(assign_result: AssignResult,
                         gt_valid: jnp.ndarray,
                         gt_labels: Optional[jnp.ndarray]) -> AssignResult:
    """Prepend trivially-assigned GT entries to an assignment over proposals
    (reference: base_sampler.py sample() + assign_result.add_gt_)."""
    g = gt_valid.shape[0]
    gt_self_inds = jnp.where(gt_valid, jnp.arange(1, g + 1, dtype=jnp.int32),
                             -1)
    gt_ovr = jnp.where(gt_valid, 1.0, -1.0)
    if gt_labels is None:
        gt_lab = jnp.full((g,), -1, jnp.int32)
    else:
        gt_lab = jnp.where(gt_valid, gt_labels.astype(jnp.int32), -1)
    return AssignResult(
        gt_inds=jnp.concatenate([gt_self_inds, assign_result.gt_inds]),
        max_overlaps=jnp.concatenate(
            [gt_ovr, assign_result.max_overlaps]),
        labels=jnp.concatenate([gt_lab, assign_result.labels]))


@BBOX_ASSIGNERS.register_module()
class PointAssigner:
    """Assign gts to points (reference: mmdet/core/bbox/assigners/
    point_assigner.py) — each gt claims the ``pos_num`` closest points
    at its scale-matched pyramid level; later gts override earlier ones
    on conflict (the reference's in-order overwrite).
    """

    def __init__(self, scale: int = 4, pos_num: int = 3):
        self.scale = scale
        self.pos_num = pos_num

    def assign(self,
               points: jnp.ndarray,
               gt_bboxes: jnp.ndarray,
               gt_valid: jnp.ndarray,
               gt_labels: Optional[jnp.ndarray] = None,
               bbox_valid: Optional[jnp.ndarray] = None) -> AssignResult:
        """points: (N, 3) [x, y, stride]; gt_bboxes: (G, 4) padded."""
        n = points.shape[0]
        g = gt_bboxes.shape[0]
        px, py = points[:, 0], points[:, 1]
        lvl = jnp.log2(points[:, 2])                          # (N,)

        cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
        cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
        gw = jnp.clip(gt_bboxes[:, 2] - gt_bboxes[:, 0], 1e-6)
        gh = jnp.clip(gt_bboxes[:, 3] - gt_bboxes[:, 1], 1e-6)
        # gt level: mean log2 size TRUNCATED toward zero (reference
        # point_assigner.py:77 `.int()`), clamped to the point levels
        gt_lvl = jnp.trunc(
            (jnp.log2(gw / self.scale) + jnp.log2(gh / self.scale)) / 2)
        lvl_i = jnp.trunc(lvl)
        gt_lvl = jnp.clip(gt_lvl, jnp.min(lvl_i), jnp.max(lvl_i))

        # elliptical distance point→gt center, per-axis normalized by
        # the gt's width/height (reference point_assigner.py:100)
        dist = jnp.sqrt(((px[:, None] - cx[None]) / gw[None]) ** 2 +
                        ((py[:, None] - cy[None]) / gh[None]) ** 2)
        same_lvl = jnp.abs(lvl_i[:, None] - gt_lvl[None]) < 0.5
        big = 1e8
        dist = jnp.where(same_lvl & gt_valid[None], dist, big)
        if bbox_valid is not None:
            dist = jnp.where(bbox_valid[:, None], dist, big)

        # each gt claims its pos_num closest points at its level
        rank = jnp.argsort(jnp.argsort(dist, axis=0), axis=0)  # (N, G)
        claims = (rank < self.pos_num) & (dist < big)
        # conflict: the CLOSEST claiming gt wins; the reference's
        # in-order loop overrides only on strictly smaller distance
        # (:110), so ties keep the earlier gt — argmin's first-match
        cl_dist = jnp.where(claims, dist, big)
        win = jnp.argmin(cl_dist, axis=1).astype(jnp.int32)
        has = jnp.any(claims, axis=1)
        gt_inds = jnp.where(has, win + 1, 0)

        if gt_labels is not None:
            lab = jnp.take(gt_labels.astype(jnp.int32),
                           jnp.clip(gt_inds - 1, 0))
            labels = jnp.where(gt_inds > 0, lab, -1)
        else:
            labels = jnp.full((n,), -1, jnp.int32)
        return AssignResult(gt_inds=gt_inds,
                            max_overlaps=jnp.where(has, 1.0, 0.0),
                            labels=labels)


@BBOX_ASSIGNERS.register_module()
class ATSSAssigner:
    """Adaptive Training Sample Selection (reference: mmdet/core/bbox/
    assigners/atss_assigner.py:10, assign:33).

    Masked static-shape re-design: per-level top-k closest candidates are
    selected over the FULL per-level anchor slab with invalid anchors
    masked to +INF distance (the reference filters to inside anchors
    first — identical selection whenever a level has >= k valid anchors,
    and candidates with INF distance are excluded from the IoU mean/std
    and positivity below, covering the remainder).
    """

    INF = 1e8

    def __init__(self, topk: int, ignore_iof_thr: float = -1, **kwargs):
        self.topk = int(topk)
        self.ignore_iof_thr = ignore_iof_thr

    def assign(self,
               bboxes: jnp.ndarray,
               num_level_bboxes,
               gt_bboxes: jnp.ndarray,
               gt_valid: jnp.ndarray,
               gt_labels: Optional[jnp.ndarray] = None,
               bbox_valid: Optional[jnp.ndarray] = None,
               gt_bboxes_ignore: Optional[jnp.ndarray] = None,
               gt_ignore_valid: Optional[jnp.ndarray] = None) -> AssignResult:
        """bboxes (N, 4) level-concatenated; num_level_bboxes static list;
        gt padded (G, 4) + gt_valid (G,); bbox_valid (N,) inside-flags."""
        import jax
        n = bboxes.shape[0]
        g = gt_bboxes.shape[0]
        if bbox_valid is None:
            bbox_valid = jnp.ones((n,), bool)

        overlaps = bbox_overlaps(bboxes, gt_bboxes)            # (N, G)
        cx = (bboxes[:, 0] + bboxes[:, 2]) / 2.0
        cy = (bboxes[:, 1] + bboxes[:, 3]) / 2.0
        gcx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2.0
        gcy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2.0
        dist = jnp.sqrt((cx[:, None] - gcx[None, :]) ** 2 +
                        (cy[:, None] - gcy[None, :]) ** 2)     # (N, G)

        ignored = jnp.zeros((n,), bool)
        if (self.ignore_iof_thr > 0 and gt_bboxes_ignore is not None
                and gt_ignore_valid is not None):
            iof = bbox_overlaps(bboxes, gt_bboxes_ignore, mode='iof')
            iof = jnp.where(gt_ignore_valid[None, :], iof, 0.0)
            ignored = jnp.max(iof, axis=1) > self.ignore_iof_thr
        sel_ok = bbox_valid & ~ignored
        dist = jnp.where(sel_ok[:, None], dist, self.INF)

        # per-level top-k closest candidates per gt (reference :114-127)
        cand_idx, cand_ok = [], []
        start = 0
        for lvl_n in num_level_bboxes:
            k = min(self.topk, int(lvl_n))
            d = jax.lax.dynamic_slice_in_dim(dist, start, lvl_n, axis=0)
            negd, idx = jax.lax.top_k(-d.T, k)                 # (G, k)
            cand_idx.append(idx.T + start)                     # (k, G)
            cand_ok.append((-negd.T) < self.INF)
            start += lvl_n
        cand_idx = jnp.concatenate(cand_idx, 0)                # (K, G)
        cand_ok = jnp.concatenate(cand_ok, 0)                  # (K, G)

        # candidate IoUs; masked mean + std (Bessel, matching torch.std)
        arange_g = jnp.arange(g)[None, :]
        cand_ovr = jnp.take_along_axis(overlaps, cand_idx, axis=0)  # (K, G)
        cnt = jnp.maximum(jnp.sum(cand_ok, 0).astype(jnp.float32), 1.0)
        mean = jnp.sum(jnp.where(cand_ok, cand_ovr, 0.0), 0) / cnt
        var = jnp.sum(jnp.where(cand_ok, (cand_ovr - mean[None, :]) ** 2,
                                0.0), 0) / jnp.maximum(cnt - 1.0, 1.0)
        thr = mean + jnp.sqrt(var)                             # (G,)
        is_pos = cand_ovr >= thr[None, :]

        # candidate centers inside gt (reference :147-154)
        ccx = jnp.take(cx, cand_idx)                           # (K, G)
        ccy = jnp.take(cy, cand_idx)
        l_ = ccx - gt_bboxes[None, :, 0]
        t_ = ccy - gt_bboxes[None, :, 1]
        r_ = gt_bboxes[None, :, 2] - ccx
        b_ = gt_bboxes[None, :, 3] - ccy
        in_gt = jnp.minimum(jnp.minimum(l_, t_), jnp.minimum(r_, b_)) > 0.01
        is_pos = is_pos & in_gt & cand_ok & gt_valid[None, :]

        # scatter candidate positivity onto the (N, G) grid; anchors
        # claimed by multiple gts take the max-IoU one (reference :156-166)
        pos_mask = jnp.zeros((n, g), bool).at[
            cand_idx, jnp.broadcast_to(arange_g, cand_idx.shape)
        ].max(is_pos, mode='drop')
        ovr_inf = jnp.where(pos_mask, overlaps, -self.INF)
        max_ovr = jnp.max(ovr_inf, axis=1)
        argmax = jnp.argmax(ovr_inf, axis=1).astype(jnp.int32)
        has_pos = max_ovr > -self.INF

        gt_inds = jnp.where(has_pos, argmax + 1, 0)
        gt_inds = jnp.where(ignored, -1, gt_inds)
        gt_inds = jnp.where(bbox_valid, gt_inds, -1)
        if gt_labels is not None:
            labels = jnp.where(
                has_pos & bbox_valid,
                jnp.take(gt_labels.astype(jnp.int32),
                         jnp.clip(argmax, 0, g - 1)), -1)
        else:
            labels = jnp.full((n,), -1, jnp.int32)
        return AssignResult(
            gt_inds=gt_inds,
            max_overlaps=jnp.where(has_pos, max_ovr, 0.0),
            labels=labels)


@BBOX_ASSIGNERS.register_module()
class GridAssigner:
    """YOLO grid assigner (reference: mmdet/core/bbox/assigners/
    grid_assigner.py:9): positives constrained to responsible cells;
    step-4 in-order gt overwrite reproduced with last-gt-wins."""

    def __init__(self, pos_iou_thr: float, neg_iou_thr,
                 min_pos_iou: float = 0.0,
                 gt_max_assign_all: bool = True, **kwargs):
        self.pos_iou_thr = pos_iou_thr
        self.neg_iou_thr = neg_iou_thr
        self.min_pos_iou = min_pos_iou
        self.gt_max_assign_all = gt_max_assign_all

    def assign(self, bboxes, responsible_flags, gt_bboxes, gt_valid,
               gt_labels=None, bbox_valid=None):
        n = bboxes.shape[0]
        g = gt_bboxes.shape[0]
        overlaps = bbox_overlaps(gt_bboxes, bboxes)          # (G, N)
        overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)
        if bbox_valid is not None:
            overlaps = jnp.where(bbox_valid[None, :], overlaps, -1.0)

        gt_inds = jnp.full((n,), -1, jnp.int32)
        max_all = jnp.max(overlaps, axis=0, initial=-1.0)
        # step 2: negatives (iou <= neg_thr over ALL anchors)
        if isinstance(self.neg_iou_thr, (tuple, list)):
            lo, hi = self.neg_iou_thr
            neg = (max_all > lo) & (max_all <= hi)
        else:
            neg = (max_all >= 0) & (max_all <= self.neg_iou_thr)
        gt_inds = jnp.where(neg, 0, gt_inds)

        # step 3: positives within responsible cells
        resp_ovr = jnp.where(responsible_flags[None, :], overlaps, -1.0)
        max_resp = jnp.max(resp_ovr, axis=0, initial=-1.0)
        arg_resp = jnp.argmax(resp_ovr, axis=0).astype(jnp.int32)
        pos = (max_resp > self.pos_iou_thr) & responsible_flags
        gt_inds = jnp.where(pos, arg_resp + 1, gt_inds)

        # step 4: each gt claims its best responsible anchor(s)
        gt_max = jnp.max(resp_ovr, axis=1, initial=-1.0)     # (G,)
        eligible = ((resp_ovr == gt_max[:, None])
                    & (gt_max[:, None] > self.min_pos_iou)
                    & responsible_flags[None, :]
                    & gt_valid[:, None])
        if not self.gt_max_assign_all:
            best = jnp.argmax(resp_ovr, axis=1)
            eligible = eligible & (jnp.arange(n)[None, :] == best[:, None])
        rev = eligible[::-1, :]
        last_g = g - 1 - jnp.argmax(rev, axis=0)
        has = jnp.any(eligible, axis=0)
        gt_inds = jnp.where(has, last_g.astype(jnp.int32) + 1, gt_inds)

        if gt_labels is not None:
            safe = jnp.clip(gt_inds - 1, 0, None)
            labels = jnp.where(gt_inds > 0,
                               jnp.take(gt_labels.astype(jnp.int32), safe),
                               -1)
        else:
            labels = jnp.full((n,), -1, jnp.int32)
        return AssignResult(gt_inds=gt_inds,
                            max_overlaps=jnp.where(max_all > -1, max_all,
                                                   0.0),
                            labels=labels)


def _scale_boxes(boxes, scale):
    c = (boxes[..., :2] + boxes[..., 2:]) * 0.5
    wh = (boxes[..., 2:] - boxes[..., :2]) * scale * 0.5
    return jnp.concatenate([c - wh, c + wh], axis=-1)


@BBOX_ASSIGNERS.register_module()
class CenterRegionAssigner:
    """Effective/ignore centre-region assignment (reference:
    mmdet/core/bbox/assigners/center_region_assigner.py:33; FSAF).

    Masked static-shape port: anchors whose centre lies in a gt's
    ``pos_scale`` core become positives (conflicts → smallest-area gt);
    anchors only in the ``neg_scale`` shadow are ignored (-1). With
    FSAF's pos_scale == neg_scale the shadow set is empty.
    """

    def __init__(self, pos_scale: float, neg_scale: float,
                 min_pos_iof: float = 1e-2,
                 ignore_gt_scale: float = 0.5, **kwargs):
        self.pos_scale = pos_scale
        self.neg_scale = neg_scale
        self.min_pos_iof = min_pos_iof
        self.ignore_gt_scale = ignore_gt_scale

    def assign(self, bboxes, gt_bboxes, gt_valid, gt_labels=None,
               bbox_valid=None, gt_bboxes_ignore=None,
               gt_ignore_valid=None, return_shadowed: bool = False):
        """Matches the reference's gt_inds/labels exactly: shadow-only
        pixels stay BACKGROUND (0, not -1 — the reference tracks them
        as a separate ``shadowed_labels`` per-class ignore list, :232);
        a positive pixel shadowed by another gt of the SAME class is
        demoted to background with label -1 (foreground_dominate=False,
        :241-247). With ``return_shadowed`` also returns the (N, G)
        bool shadow-pair mask (the reference's shadowed list) so FSAF
        can zero per-class label weights."""
        n = bboxes.shape[0]
        g = gt_bboxes.shape[0]
        centers = (bboxes[:, :2] + bboxes[:, 2:4]) * 0.5
        in_gt = ((centers[:, None, 0] >= gt_bboxes[None, :, 0])
                 & (centers[:, None, 0] <= gt_bboxes[None, :, 2])
                 & (centers[:, None, 1] >= gt_bboxes[None, :, 1])
                 & (centers[:, None, 1] <= gt_bboxes[None, :, 3]))
        core = _scale_boxes(gt_bboxes, self.pos_scale)
        shadow = _scale_boxes(gt_bboxes, self.neg_scale)
        iof_core = bbox_overlaps(bboxes, core, mode='iof')
        in_core = in_gt & (iof_core > self.min_pos_iof) \
            & gt_valid[None, :]
        iof_shadow = bbox_overlaps(bboxes, shadow, mode='iof')
        in_shadow = (iof_shadow > self.min_pos_iof) & gt_valid[None, :] \
            & ~in_core
        if bbox_valid is not None:
            in_core &= bbox_valid[:, None]
            in_shadow &= bbox_valid[:, None]

        # conflicts: smaller gt area wins (reference get_gt_priorities)
        areas = ((gt_bboxes[:, 2] - gt_bboxes[:, 0])
                 * (gt_bboxes[:, 3] - gt_bboxes[:, 1]))
        areas = jnp.where(gt_valid, areas, jnp.inf)
        score = jnp.where(in_core, -areas[None, :], -jnp.inf)
        arg = jnp.argmax(score, axis=1).astype(jnp.int32)
        pos = jnp.any(in_core, axis=1)
        gt_inds = jnp.where(pos, arg + 1, 0)
        # the reference's shadowed list = shadow-ring pairs + core
        # memberships that lost the priority contest (:322-329)
        winner = jax.nn.one_hot(arg, g, dtype=bool) & pos[:, None]
        shadowed = in_shadow | (in_core & ~winner)

        if gt_labels is not None:
            gl = gt_labels.astype(jnp.int32)
            labels = jnp.where(pos, jnp.take(gl, jnp.clip(arg, 0)), -1)
            # same-class shadow demotion (foreground_dominate=False)
            same = shadowed & (gl[None, :] == labels[:, None]) \
                & pos[:, None]
            demote = jnp.any(same, axis=1)
            gt_inds = jnp.where(demote, 0, gt_inds)
            labels = jnp.where(demote, -1, labels)
        else:
            labels = jnp.full((n,), -1, jnp.int32)

        if gt_bboxes_ignore is not None and gt_ignore_valid is not None:
            ig = _scale_boxes(gt_bboxes_ignore, self.ignore_gt_scale)
            in_ig = ((centers[:, None, 0] >= ig[None, :, 0])
                     & (centers[:, None, 0] <= ig[None, :, 2])
                     & (centers[:, None, 1] >= ig[None, :, 1])
                     & (centers[:, None, 1] <= ig[None, :, 3])
                     & gt_ignore_valid[None, :])
            gt_inds = jnp.where(jnp.any(in_ig, axis=1), -1, gt_inds)

        max_iof = jnp.max(jnp.where(gt_valid[None, :], iof_core, 0.0),
                          axis=1)
        result = AssignResult(gt_inds=gt_inds, max_overlaps=max_iof,
                              labels=labels)
        if return_shadowed:
            return result, shadowed
        return result


@BBOX_ASSIGNERS.register_module()
class HungarianAssigner:
    """One-to-one set assignment for DETR-family heads (reference:
    mmdet/core/bbox/assigners/hungarian_assigner.py:16, assign:52).

    The reference computes the weighted cost matrix on device, then
    round-trips to the host for scipy's linear_sum_assignment; here the
    whole thing stays under jit (core/bbox/lsa.py) so the train step has
    no host sync. GT padding: invalid gts become constant-cost rows in
    the LSA (optimality of the valid sub-assignment is preserved) and
    their matches are dropped from the result.
    """

    def __init__(self, cls_cost=None, reg_cost=None, iou_cost=None):
        from .match_costs import build_match_cost
        self.cls_cost = build_match_cost(
            dict(cls_cost or dict(type='ClassificationCost', weight=1.)))
        self.reg_cost = build_match_cost(
            dict(reg_cost or dict(type='BBoxL1Cost', weight=1.)))
        self.iou_cost = build_match_cost(
            dict(iou_cost or dict(type='IoUCost', iou_mode='giou',
                                  weight=1.)))

    def assign(self,
               bbox_pred: jnp.ndarray,
               cls_pred: jnp.ndarray,
               gt_bboxes: jnp.ndarray,
               gt_valid: jnp.ndarray,
               gt_labels: jnp.ndarray,
               img_whwh: jnp.ndarray) -> AssignResult:
        """Args:
            bbox_pred: (Q, 4) normalized (cx, cy, w, h) in [0, 1].
            cls_pred: (Q, C) classification logits.
            gt_bboxes: (G, 4) xyxy in image pixels, padded.
            gt_valid: (G,) bool.
            gt_labels: (G,) int.
            img_whwh: (4,) [w, h, w, h] of the valid image region.
        """
        from .lsa import linear_sum_assignment
        from .transforms import bbox_cxcywh_to_xyxy

        q = bbox_pred.shape[0]
        g = gt_bboxes.shape[0]
        labels_safe = jnp.clip(gt_labels.astype(jnp.int32), 0)
        cls_cost = self.cls_cost(cls_pred, labels_safe)          # (Q, G)
        norm_gt = gt_bboxes / img_whwh[None, :]
        reg_cost = self.reg_cost(bbox_pred, norm_gt)             # (Q, G)
        boxes_xyxy = bbox_cxcywh_to_xyxy(bbox_pred) * img_whwh[None, :]
        iou_cost = self.iou_cost(boxes_xyxy, gt_bboxes)          # (Q, G)
        cost = (cls_cost + reg_cost + iou_cost).astype(jnp.float32)

        if g > q:
            # GT padding can exceed the query count (the loader pads to a
            # fixed max); only <=Q gts can ever match, so compact valid
            # gts to the front and solve the (Q, Q) sub-problem. Exact
            # whenever #valid <= Q (the reference's operating regime).
            perm = jnp.argsort(~gt_valid, stable=True)           # (G,)
            sub = perm[:q]
            col4sub = linear_sum_assignment(cost.T[sub], gt_valid[sub])
            col4gt = jnp.full((g,), q, jnp.int32).at[sub].set(col4sub)
        else:
            # rows = gts, cols = queries
            col4gt = linear_sum_assignment(cost.T, gt_valid)     # (G,)
        gt_inds = jnp.zeros((q,), jnp.int32)
        src = jnp.where(gt_valid, jnp.arange(g, dtype=jnp.int32) + 1, 0)
        tgt = jnp.where(gt_valid, jnp.clip(col4gt, 0, q), q)  # q = scratch
        gt_inds = jnp.zeros((q + 1,), jnp.int32).at[tgt].set(src)[:q]
        labels = jnp.zeros((q + 1,), jnp.int32).at[tgt].set(
            jnp.where(gt_valid, labels_safe, 0))[:q]
        labels = jnp.where(gt_inds > 0, labels, -1)
        return AssignResult(gt_inds=gt_inds,
                            max_overlaps=jnp.zeros((q,), jnp.float32),
                            labels=labels)


@BBOX_ASSIGNERS.register_module()
class ApproxMaxIoUAssigner(MaxIoUAssigner):
    """Max-IoU assignment where each candidate square's overlap with a gt
    is the max over its ``approxs_per_octave`` approx anchors (reference:
    core/bbox/assigners/approx_max_iou_assigner.py:10 — GuidedAnchor's
    ga_assigner). Reuses MaxIoUAssigner's 4 steps via the ``overlaps``
    override."""

    def assign(self, bboxes, gt_bboxes, gt_valid, gt_labels=None,
               bbox_valid=None, approxs=None, approxs_per_octave=None,
               **kwargs):
        """bboxes: (S, 4) squares; approxs: (S * k, 4) grouped k per
        square (anchor-major interleave: approxs[s*k+j])."""
        if approxs is None:
            return super().assign(bboxes, gt_bboxes, gt_valid, gt_labels,
                                  bbox_valid=bbox_valid, **kwargs)
        s = bboxes.shape[0]
        k = approxs_per_octave
        all_ov = bbox_overlaps(approxs, gt_bboxes)       # (S*k, G)
        overlaps = all_ov.reshape(s, k, -1).max(axis=1)  # (S, G)
        return super().assign(bboxes, gt_bboxes, gt_valid, gt_labels,
                              bbox_valid=bbox_valid, overlaps=overlaps,
                              **kwargs)


def calc_region(bbox, ratio, stride, featmap_size):
    """Region of ``bbox`` shrunk toward its center by ``ratio``, in
    feature cells (reference: region_assigner.py:9 calc_region)."""
    f = bbox / stride
    x1 = jnp.round((1 - ratio) * f[..., 0] + ratio * f[..., 2])
    y1 = jnp.round((1 - ratio) * f[..., 1] + ratio * f[..., 3])
    x2 = jnp.round(ratio * f[..., 0] + (1 - ratio) * f[..., 2])
    y2 = jnp.round(ratio * f[..., 1] + (1 - ratio) * f[..., 3])
    h, w = featmap_size
    return (jnp.clip(x1, 0, w), jnp.clip(y1, 0, h),
            jnp.clip(x2, 0, w), jnp.clip(y2, 0, h))


@BBOX_ASSIGNERS.register_module()
class RegionAssigner:
    """Center-region assignment over scale-routed levels (reference:
    core/bbox/assigners/region_assigner.py:36 — CascadeRPN/GA). Each gt
    paints a positive center region at its routed level, an ignore ring
    around it, and ignore regions on the two adjacent levels; the
    reference's in-order gt loop (later gt overwrites) becomes a
    reversed-argmax over the padded gt axis."""

    def __init__(self, center_ratio: float = 0.2,
                 ignore_ratio: float = 0.5):
        self.center_ratio = center_ratio
        self.ignore_ratio = ignore_ratio

    def assign(self, anchor_list, featmap_sizes, strides, anchor_scale,
               gt_bboxes, gt_valid, gt_labels=None,
               bbox_valid=None) -> AssignResult:
        """anchor_list: per-level (N_l, 4) anchors (row-major grid).
        Returns a full-set AssignResult over the concatenated levels
        (max_overlaps is 1 for positives — the reference returns None)."""
        num_lvls = len(anchor_list)
        r1 = (1 - self.center_ratio) / 2
        r2 = (1 - self.ignore_ratio) / 2
        g = gt_bboxes.shape[0]

        scale = jnp.sqrt(jnp.maximum(
            (gt_bboxes[:, 2] - gt_bboxes[:, 0]) *
            (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 1e-6))
        min_anchor = float(anchor_scale * strides[0])
        tl = jnp.clip(jnp.floor(jnp.log2(scale) - np.log2(min_anchor)
                                + 0.5),
                      0, num_lvls - 1).astype(jnp.int32)

        def in_region(centers, region):
            x1, y1, x2, y2 = region                      # each (G,)
            cx, cy = centers[:, 0], centers[:, 1]        # (N,)
            return ((cx[None, :] >= x1[:, None]) &
                    (cx[None, :] <= x2[:, None]) &
                    (cy[None, :] >= y1[:, None]) &
                    (cy[None, :] <= y2[:, None]))        # (G, N)

        lvl_inds = []
        for lvl in range(num_lvls):
            stride = strides[lvl]
            anchors = anchor_list[lvl]
            centers = jnp.stack(
                [(anchors[:, 0] + anchors[:, 2]) * 0.5 / stride,
                 (anchors[:, 1] + anchors[:, 3]) * 0.5 / stride], -1)
            at_l = (tl == lvl) & gt_valid
            ign = in_region(centers, calc_region(
                gt_bboxes, r2, stride, featmap_sizes[lvl])) & at_l[:, None]
            pos = in_region(centers, calc_region(
                gt_bboxes, r1, stride, featmap_sizes[lvl])) & at_l[:, None]
            # center region is nested inside the ignore region, so the
            # last gt whose ignore region covers an anchor decides it:
            # positive if its center region also covers, else ignore
            touched = ign | pos
            rev = touched[::-1]
            last_g = g - 1 - jnp.argmax(rev, axis=0)
            has = jnp.any(touched, axis=0)
            is_pos = jnp.take_along_axis(pos, last_g[None], 0)[0]
            inds = jnp.where(has,
                             jnp.where(is_pos, last_g + 1, -1), 0)
            # adjacent-level ignore overrides everything painted so far
            adj_l = ((tl == lvl - 1) | (tl == lvl + 1)) & gt_valid
            adj = jnp.any(in_region(centers, calc_region(
                gt_bboxes, r2, stride, featmap_sizes[lvl]))
                & adj_l[:, None], axis=0)
            inds = jnp.where(adj, -1, inds)
            lvl_inds.append(inds.astype(jnp.int32))

        gt_inds = jnp.concatenate(lvl_inds, 0)
        if bbox_valid is not None:
            gt_inds = jnp.where(bbox_valid, gt_inds, -1)
        if gt_labels is not None:
            safe = jnp.clip(gt_inds - 1, 0, None)
            labels = jnp.where(gt_inds > 0,
                               jnp.take(gt_labels, safe, axis=0), -1)
        else:
            labels = jnp.full(gt_inds.shape, -1, jnp.int32)
        return AssignResult(gt_inds=gt_inds,
                            max_overlaps=(gt_inds > 0).astype(jnp.float32),
                            labels=labels.astype(jnp.int32))
