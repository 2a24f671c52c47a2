"""PAAHead (reference: mmdet/models/dense_heads/paa_head.py:45;
arXiv:2007.08103) — probabilistic anchor assignment: candidate
positives are scored by their joint cls+loc loss, a per-gt 2-component
1-D GMM splits them into confident positives vs noise, and only the
low-loss mode up to its likelihood peak stays positive.

TPU-native: the reference fits sklearn GaussianMixture per gt inside a
python loop; here it is a fixed-iteration masked EM vmapped over the
padded gt axis (same init: means [min,max], weights ½/½; sklearn's
reg_covar 1e-6 retained). Score voting is a vectorized IoU-weighted
box average instead of the per-class python loop."""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS, build_loss
from ...core.anchors import anchor_inside_flags
from ...core.bbox.iou import bbox_overlaps
from ...core.nms import multiclass_nms
from .atss_head import ATSSHead

EPS = 1e-12
INF = 1e8


def _gmm_em_1d(x, valid, tol: float = 1e-3, max_iter: int = 100,
               reg: float = 1e-6):
    """sklearn-faithful masked 2-component 1-D EM
    (reference: paa_head.py:322-341 fits
    sklearn.mixture.GaussianMixture(2, covariance_type='diag',
    weights_init=[.5,.5], means_init=[min,max], precisions_init=1);
    sklearn defaults tol=1e-3, max_iter=100, reg_covar=1e-6).

    Mirrors sklearn.mixture._base.BaseMixture.fit_predict exactly:
    e-step -> m-step per iteration, lower bound = mean per-sample
    log-likelihood computed in the e-step, stop when |change| < tol or
    max_iter; m-step uses nk = sum(resp) + 10*eps, diag covariance
    E[x^2] - mean^2 + reg_covar, weights renormalized; a final e-step
    yields the assignment. Component identity is preserved (comp 0
    seeded at the min loss), matching the reference's use of
    ``gmm_assignment == 0`` as the positive mode.

    x (M,) sorted ascending, valid (M,). Returns (assignment-0 mask,
    score_samples log-likelihood), both (M,).
    """
    x = jax.lax.stop_gradient(x)   # ref fits on detached numpy losses
    xv = jnp.where(valid, x, 0.0)
    n = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    mn = jnp.min(jnp.where(valid, x, INF))
    mx = jnp.max(jnp.where(valid, x, -INF))
    mu0 = jnp.stack([mn, mx])
    var0 = jnp.ones((2,))
    w0 = jnp.full((2,), 0.5)
    eps10 = 10.0 * jnp.finfo(jnp.float32).eps

    def weighted_lp(mu, var, w):
        return (-0.5 * ((x[:, None] - mu[None]) ** 2 / var[None]
                        + jnp.log(2 * jnp.pi * var[None]))
                + jnp.log(jnp.maximum(w[None], EPS)))      # (M, 2)

    def cond(c):
        _, _, _, _, it, done = c
        return (~done) & (it < max_iter)

    def body(c):
        mu, var, w, lb_prev, it, _ = c
        lp = weighted_lp(mu, var, w)
        lpn = jax.scipy.special.logsumexp(lp, axis=-1)
        r = jnp.where(valid[:, None], jnp.exp(lp - lpn[:, None]), 0.0)
        lb = jnp.sum(jnp.where(valid, lpn, 0.0)) / n
        nk = r.sum(0) + eps10
        mu_n = (r * xv[:, None]).sum(0) / nk
        avg_x2 = (r * (xv ** 2)[:, None]).sum(0) / nk
        var_n = avg_x2 - mu_n ** 2 + reg
        w_n = nk / n
        w_n = w_n / w_n.sum()
        return (mu_n, var_n, w_n, lb, it + 1,
                jnp.abs(lb - lb_prev) < tol)

    mu, var, w, _, _, _ = jax.lax.while_loop(
        cond, body,
        (mu0, var0, w0, -jnp.inf, jnp.int32(0), jnp.bool_(False)))
    lp = weighted_lp(mu, var, w)
    resp0 = lp[:, 0] >= lp[:, 1]   # argmax tie -> comp 0, like numpy
    loglik = jax.scipy.special.logsumexp(lp, axis=-1)
    return resp0, loglik


def _np_em_single(x, v, tol=1e-3, max_iter=100, reg=1e-6):
    """numpy float64 twin of :func:`_gmm_em_1d` for one (M,) sample set.
    Double precision matters: near-symmetric loss clusters (random-init
    candidates are almost uniformly spaced) make the EM trajectory
    chaotic, and fp32 converges to a different (also valid) optimum
    than the reference's host-side sklearn fit. In fp64 the trajectory
    locks to sklearn's in practice (verified on captured cases)."""
    import numpy as np
    x = np.asarray(x, np.float64)
    v = np.asarray(v, bool)
    n = max(v.sum(), 1)
    xv = np.where(v, x, 0.0)
    big = np.float64(INF)
    mu = np.array([np.where(v, x, big).min(),
                   np.where(v, x, -big).max()])
    var = np.ones(2)
    w = np.full(2, 0.5)
    eps10 = 10 * np.finfo(np.float64).eps
    lb_prev = -np.inf

    def weighted_lp(mu, var, w):
        return (-0.5 * ((x[:, None] - mu[None]) ** 2 / var[None]
                        + np.log(2 * np.pi * var[None]))
                + np.log(np.maximum(w[None], EPS)))

    for _ in range(max_iter):
        lp = weighted_lp(mu, var, w)
        lpn = np.logaddexp(lp[:, 0], lp[:, 1])
        r = np.where(v[:, None], np.exp(lp - lpn[:, None]), 0.0)
        lb = np.where(v, lpn, 0.0).sum() / n
        nk = r.sum(0) + eps10
        mu = (r * xv[:, None]).sum(0) / nk
        var = (r * (xv ** 2)[:, None]).sum(0) / nk - mu ** 2 + reg
        w = nk / n
        w = w / w.sum()
        if abs(lb - lb_prev) < tol:
            break
        lb_prev = lb
    lp = weighted_lp(mu, var, w)
    return (lp[:, 0] >= lp[:, 1],
            np.logaddexp(lp[:, 0], lp[:, 1]).astype(np.float32))


def _gmm_em_1d_host(x, valid):
    """Host fp64 EM via pure_callback — the CPU-backend twin of
    _gmm_em_1d, mirroring the reference's own design (it ships losses
    to the host and fits sklearn in double there, paa_head.py:322-341).
    On TPU the in-graph fp32 EM avoids the per-gt host round-trip; the
    boundary can differ from sklearn only in near-degenerate symmetric
    clusters (documented divergence). Gradients don't flow into the
    assignment (losses are stop_gradient'd)."""
    x = jax.lax.stop_gradient(x)
    m = x.shape[-1]
    return jax.pure_callback(
        _np_em_single,
        (jax.ShapeDtypeStruct((m,), jnp.bool_),
         jax.ShapeDtypeStruct((m,), jnp.float32)),
        x, valid, vmap_method='sequential')


@HEADS.register_module()
class PAAHead(ATSSHead):
    topk: int = 9
    score_voting: bool = True
    covariance_type: str = 'diag'

    # ------------------------------------------------------------- loss
    def loss(self, rng, cls_scores, bbox_preds, iou_preds, gt_bboxes,
             gt_valid, gt_labels, img_shapes,
             pad_shapes) -> Dict[str, jnp.ndarray]:
        featmap_sizes = tuple((s.shape[1], s.shape[2])
                              for s in cls_scores)
        anchor_list = self.get_anchors(featmap_sizes)
        num_lvl = [int(a.shape[0]) for a in anchor_list]
        flat_anchors = jnp.concatenate(anchor_list, 0)
        n = flat_anchors.shape[0]
        b = gt_bboxes.shape[0]
        g = gt_bboxes.shape[1]
        # static level id per anchor
        lvl_id = jnp.concatenate([
            jnp.full((m,), i, jnp.int32) for i, m in enumerate(num_lvl)])
        num_levels = len(num_lvl)

        cls_flat = jnp.concatenate([
            s.astype(jnp.float32).reshape(b, -1, self.cls_out_channels)
            for s in cls_scores], 1)
        box_flat = jnp.concatenate([
            p.astype(jnp.float32).reshape(b, -1, 4)
            for p in bbox_preds], 1)
        iou_flat = jnp.concatenate([
            p.astype(jnp.float32).reshape(b, -1)
            for p in iou_preds], 1)

        def per_image(cls_s, box_p, gb, gv, gl, ish, ps):
            valid_flags = jnp.concatenate(
                self.prior_generator.valid_flags(featmap_sizes, ps), 0)
            inside = anchor_inside_flags(
                flat_anchors, valid_flags, ish,
                self.train_cfg.get('allowed_border', -1))
            assign = self._assigner.assign(flat_anchors, gb, gv, gl,
                                           bbox_valid=inside)
            pos = assign.gt_inds > 0
            pos_gt = jnp.clip(assign.gt_inds - 1, 0)
            labels = jnp.where(pos, jnp.clip(assign.labels, 0),
                               self.num_classes)
            label_weight = inside.astype(jnp.float32)
            gt_box = jnp.take(gb, pos_gt, axis=0)           # (N, 4)

            # joint cls+loc loss of candidate positives (reference
            # get_pos_loss :201)
            decoded = self._bbox_coder.decode(flat_anchors, box_p)
            loss_c = self._loss_cls(
                cls_s, labels, reduction_override='none',
                avg_factor=1.0).sum(-1)
            loss_b = self._loss_bbox(
                decoded, gt_box, reduction_override='none',
                avg_factor=1.0)
            if loss_b.ndim > 1:
                loss_b = loss_b.sum(-1)
            pos_loss = jnp.where(pos, loss_c + loss_b, INF)

            # per-(gt, level) top-k lowest-loss candidates → per-gt GMM
            def per_gt(gi):
                cand_idx, cand_loss, cand_valid = [], [], []
                for lv in range(num_levels):
                    m = pos & (pos_gt == gi) & (lvl_id == lv)
                    masked = jnp.where(m, pos_loss, INF)
                    k = min(self.topk, n)
                    vals, idxs = jax.lax.top_k(-masked, k)
                    cand_idx.append(idxs)
                    cand_loss.append(-vals)
                    cand_valid.append(-vals < INF / 2)
                ci = jnp.concatenate(cand_idx)
                cl = jnp.concatenate(cand_loss)
                cv = jnp.concatenate(cand_valid)
                order = jnp.argsort(jnp.where(cv, cl, INF))
                ci, cl, cv = ci[order], cl[order], cv[order]
                enough = jnp.sum(cv) >= 2
                em = (_gmm_em_1d_host
                      if jax.default_backend() == 'cpu' else _gmm_em_1d)
                resp0, loglik = em(jnp.where(cv, cl, 0.0), cv)
                fgs = resp0 & cv
                # keep the fg run up to its max-likelihood sample
                # (separation scheme (c), reference :366)
                best = jnp.argmax(jnp.where(fgs, loglik, -INF))
                fg_rank = jnp.cumsum(fgs.astype(jnp.int32)) - 1
                sel = fgs & (fg_rank <= fg_rank[best]) & enough
                sel &= jnp.any(fgs)
                return ci, sel & cv

            gidx = jnp.arange(g)
            ci_all, sel_all = jax.vmap(per_gt)(gidx)        # (G, L*topk)
            sel_all = sel_all & gv[:, None]
            keep = jnp.zeros((n,), bool).at[ci_all.reshape(-1)].max(
                sel_all.reshape(-1), mode='drop')

            new_labels = jnp.where(pos & ~keep, self.num_classes, labels)
            new_pos = pos & keep
            return (new_labels, label_weight, new_pos, gt_box)

        labels, label_weights, pos, gt_box = jax.vmap(per_image)(
            cls_flat, box_flat, gt_bboxes, gt_valid, gt_labels,
            img_shapes, pad_shapes)
        num_pos = jnp.sum(pos).astype(jnp.float32)

        loss_cls = self._loss_cls(
            cls_flat.reshape(-1, self.cls_out_channels),
            labels.reshape(-1), weight=label_weights.reshape(-1),
            avg_factor=jnp.maximum(num_pos, float(b)))

        decoded = self._bbox_coder.decode(
            jnp.broadcast_to(flat_anchors[None], (b, n, 4)), box_flat)
        iou_t = bbox_overlaps(jax.lax.stop_gradient(decoded), gt_box,
                              is_aligned=True)
        iou_t = jnp.where(pos, iou_t, 0.0)
        loss_iou = self._loss_centerness(
            iou_flat.reshape(-1, 1), iou_t.reshape(-1, 1),
            weight=pos.reshape(-1).astype(jnp.float32),
            avg_factor=jnp.maximum(num_pos, 1.0))
        loss_bbox = self._loss_bbox(
            decoded.reshape(-1, 4), gt_box.reshape(-1, 4),
            weight=jnp.where(pos, jnp.clip(iou_t, EPS),
                             0.0).reshape(-1),
            avg_factor=jnp.maximum(jnp.sum(iou_t), EPS))
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_iou=loss_iou)

    # ------------------------------------------------------------- boxes
    def get_bboxes(self, cls_scores, bbox_preds, iou_preds, img_shapes,
                   scale_factors, cfg=None, rescale: bool = True,
                   with_nms: bool = True):
        """sqrt(cls * iou) NMS scores + optional score voting
        (reference :519)."""
        cfg = dict(cfg or self.test_cfg)
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        anchors = self.get_anchors(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)
        b = cls_scores[0].shape[0]

        def per_image(scores_lvls, preds_lvls, iou_lvls, img_shape,
                      scale_factor):
            mlvl_boxes, mlvl_scores = [], []
            for lvl in range(len(scores_lvls)):
                sc = jax.nn.sigmoid(scores_lvls[lvl].reshape(
                    -1, self.cls_out_channels).astype(jnp.float32))
                io = jax.nn.sigmoid(
                    iou_lvls[lvl].reshape(-1).astype(jnp.float32))
                bp = preds_lvls[lvl].reshape(-1, 4)
                a = anchors[lvl]
                nms_sc = jnp.sqrt(sc * io[:, None])
                if 0 < nms_pre < sc.shape[0]:
                    from ...core.nms import fast_topk
                    _, topk = fast_topk(nms_sc.max(-1), nms_pre)
                    nms_sc, bp, a = nms_sc[topk], bp[topk], a[topk]
                boxes = self._bbox_coder.decode(a, bp,
                                                max_shape=img_shape)
                mlvl_boxes.append(boxes)
                mlvl_scores.append(nms_sc)
            boxes = jnp.concatenate(mlvl_boxes, 0)
            scores = jnp.concatenate(mlvl_scores, 0)
            if rescale:
                boxes = boxes / scale_factor[None, :4]
            scores = jnp.concatenate(
                [scores, jnp.zeros_like(scores[:, :1])], -1)
            if not with_nms:
                return boxes, scores
            res = multiclass_nms(boxes, scores, cfg['score_thr'],
                                 dict(cfg['nms']),
                                 cfg.get('max_per_img', 100))
            if not self.score_voting:
                return res
            # vectorized score voting (reference :606): IoU-weighted
            # average over same-class candidates above score_thr
            dets, labels_, valid = res.dets, res.labels, res.valid
            cand_sc = scores[:, jnp.clip(labels_, 0)]        # (N, K)
            iou = bbox_overlaps(dets[:, :4], boxes)          # (K, N)
            w = jnp.exp(-(1 - iou) ** 2 / 0.025) * cand_sc.T
            w = jnp.where((iou > 0.01) &
                          (cand_sc.T > cfg['score_thr']), w, 0.0)
            den = jnp.maximum(w.sum(-1, keepdims=True), EPS)
            voted = (w @ boxes) / den
            voted = jnp.where((w.sum(-1) > 0)[:, None] &
                              valid[:, None], voted, dets[:, :4])
            dets = jnp.concatenate([voted, dets[:, 4:5]], -1)
            return res._replace(dets=dets)

        return jax.vmap(per_image)(
            [s.reshape(b, -1, self.cls_out_channels) for s in cls_scores],
            [p.reshape(b, -1, 4) for p in bbox_preds],
            [p.reshape(b, -1) for p in iou_preds],
            img_shapes, scale_factors)
