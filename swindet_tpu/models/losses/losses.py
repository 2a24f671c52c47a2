"""Detection losses — pure-JAX, weighted/masked, fp32 accumulation.

TPU-native equivalents of the reference losses (reference:
mmdet/models/losses/cross_entropy_loss.py, focal_loss.py:11 (the pure-py
spec of the CUDA sigmoid_focal_loss), smooth_l1_loss.py, iou_loss.py).
All take elementwise ``weight`` plus ``avg_factor`` and never rely on
dynamic shapes: padded entries carry weight 0.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..builder import LOSSES
from ...core.bbox.iou import bbox_overlaps


def weight_reduce_loss(loss: jnp.ndarray,
                       weight: Optional[jnp.ndarray] = None,
                       reduction: str = 'mean',
                       avg_factor: Optional[jnp.ndarray] = None):
    """elementwise weight → reduce; with avg_factor, sum/avg_factor
    (reference: mmdet/models/losses/utils.py)."""
    if weight is not None:
        loss = loss * weight
    if reduction == 'none':
        return loss
    if reduction == 'sum':
        return jnp.sum(loss)
    if avg_factor is None:
        return jnp.mean(loss)
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-12)


def _expand_onehot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """labels in [0, C) → one-hot (N, C); label == C (background) or < 0
    (ignore/pad) → all-zero row (reference: cross_entropy_loss.py
    _expand_onehot_labels)."""
    valid = (labels >= 0) & (labels < num_classes)
    oh = jax.nn.one_hot(jnp.where(valid, labels, 0), num_classes)
    return jnp.where(valid[..., None], oh, 0.0)


@LOSSES.register_module()
class CrossEntropyLoss:
    """Softmax CE / sigmoid BCE / mask BCE (reference:
    cross_entropy_loss.py). ``use_mask`` applies per-RoI BCE on the
    predicted class's mask channel only."""

    def __init__(self, use_sigmoid: bool = False, use_mask: bool = False,
                 reduction: str = 'mean', class_weight=None,
                 loss_weight: float = 1.0):
        self.use_sigmoid = use_sigmoid
        self.use_mask = use_mask
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, label, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        pred = pred.astype(jnp.float32)
        if self.use_mask:
            # pred: (N, H, W) logits already gathered for the target class;
            # label: (N, H, W) binary targets
            loss = _bce_with_logits(pred, label.astype(jnp.float32))
            loss = jnp.mean(loss, axis=tuple(range(1, loss.ndim)))
        elif self.use_sigmoid:
            if pred.ndim > 1 and pred.shape[-1] >= 1 and label.ndim \
                    == pred.ndim - 1:
                target = _expand_onehot(label, pred.shape[-1])
            else:
                target = label.astype(jnp.float32)
            loss = _bce_with_logits(pred, target)   # (N, C) elementwise
            if weight is not None and weight.ndim < loss.ndim:
                weight = weight[..., None]
        else:
            logp = jax.nn.log_softmax(pred, axis=-1)
            safe = jnp.clip(label, 0, pred.shape[-1] - 1)
            loss = -jnp.take_along_axis(logp, safe[..., None],
                                        axis=-1)[..., 0]
            loss = jnp.where(label >= 0, loss, 0.0)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


def _bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


@LOSSES.register_module()
class FocalLoss:
    """Sigmoid focal loss (reference: focal_loss.py:11 py_sigmoid_focal_loss
    — the pure-python spec of the CUDA kernel)."""

    def __init__(self, use_sigmoid: bool = True, gamma: float = 2.0,
                 alpha: float = 0.25, reduction: str = 'mean',
                 loss_weight: float = 1.0):
        assert use_sigmoid, 'only sigmoid focal loss supported'
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        pred = pred.astype(jnp.float32)
        num_classes = pred.shape[-1]
        if target.ndim == pred.ndim - 1:
            target = _expand_onehot(target, num_classes)
        p = jax.nn.sigmoid(pred)
        pt = (1 - p) * target + p * (1 - target)
        focal_weight = (self.alpha * target + (1 - self.alpha) *
                        (1 - target)) * pt ** self.gamma
        loss = _bce_with_logits(pred, target) * focal_weight
        if weight is not None and weight.ndim < loss.ndim:
            weight = weight[..., None]
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class L1Loss:
    def __init__(self, reduction: str = 'mean', loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        loss = jnp.abs(pred.astype(jnp.float32) -
                       target.astype(jnp.float32))
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class SmoothL1Loss:
    def __init__(self, beta: float = 1.0, reduction: str = 'mean',
                 loss_weight: float = 1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, beta=None, **kwargs):
        reduction = reduction_override or self.reduction
        b = self.beta if beta is None else beta
        diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
        loss = jnp.where(diff < b, 0.5 * diff * diff / b,
                         diff - 0.5 * b)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class IoULoss:
    """-log(iou) (mode 'log') or 1 - iou (mode 'linear')."""

    def __init__(self, linear: bool = False, mode: str = 'log',
                 eps: float = 1e-6, reduction: str = 'mean',
                 loss_weight: float = 1.0):
        self.mode = 'linear' if linear else mode
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        ious = bbox_overlaps(pred.astype(jnp.float32),
                             target.astype(jnp.float32),
                             is_aligned=True).clip(self.eps)
        if self.mode == 'linear':
            loss = 1 - ious
        elif self.mode == 'square':
            loss = 1 - ious ** 2
        else:
            loss = -jnp.log(ious)
        if weight is not None and weight.ndim == loss.ndim + 1:
            weight = weight.mean(-1)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class GIoULoss:
    """1 - GIoU (reference: iou_loss.py GIoULoss; used by the cascade Swin
    configs with loss_weight=10)."""

    def __init__(self, eps: float = 1e-7, reduction: str = 'mean',
                 loss_weight: float = 1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        gious = bbox_overlaps(pred.astype(jnp.float32),
                              target.astype(jnp.float32),
                              mode='giou', is_aligned=True, eps=self.eps)
        loss = 1 - gious
        if weight is not None and weight.ndim == loss.ndim + 1:
            weight = weight.mean(-1)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class QualityFocalLoss:
    """Quality Focal Loss (reference: losses/gfocal_loss.py:11
    quality_focal_loss — arXiv:2006.04388). ``target`` is the tuple
    (labels (N,), quality score (N,)): negatives are supervised toward 0
    with a |sigmoid|^beta modulator; a positive's target class is
    supervised toward its quality (IoU) score."""

    def __init__(self, use_sigmoid: bool = True, beta: float = 2.0,
                 reduction: str = 'mean', loss_weight: float = 1.0):
        assert use_sigmoid, 'only sigmoid QFL supported'
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        label, score = target
        pred = pred.astype(jnp.float32)
        num_classes = pred.shape[-1]
        sig = jax.nn.sigmoid(pred)
        # all entries toward 0, modulated by sigmoid^beta
        loss = _bce_with_logits(pred, jnp.zeros_like(pred)) * \
            sig ** self.beta
        # positives: target-class column toward the quality score
        pos = (label >= 0) & (label < num_classes)
        safe = jnp.clip(label, 0, num_classes - 1)
        onehot = jax.nn.one_hot(safe, num_classes, dtype=bool)
        score_b = jnp.broadcast_to(score[..., None], pred.shape)
        mod = jnp.abs(score_b - sig) ** self.beta
        pos_loss = _bce_with_logits(pred, score_b) * mod
        loss = jnp.where(pos[..., None] & onehot, pos_loss, loss)
        loss = jnp.sum(loss, axis=-1)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class DistributionFocalLoss:
    """Distribution Focal Loss (reference: gfocal_loss.py:55
    distribution_focal_loss): CE toward the two integer bins bracketing
    the continuous distance label, linearly weighted."""

    def __init__(self, reduction: str = 'mean', loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, label, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        pred = pred.astype(jnp.float32)
        n_bins = pred.shape[-1]
        label = jnp.clip(label.astype(jnp.float32), 0, n_bins - 1 - 1e-6)
        left = jnp.floor(label).astype(jnp.int32)
        right = left + 1
        wl = right.astype(jnp.float32) - label
        wr = label - left.astype(jnp.float32)
        logp = jax.nn.log_softmax(pred, axis=-1)
        ll = -jnp.take_along_axis(logp, left[..., None], axis=-1)[..., 0]
        lr = -jnp.take_along_axis(
            logp, jnp.clip(right, 0, n_bins - 1)[..., None], axis=-1)[..., 0]
        loss = ll * wl + lr * wr
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


def accuracy(pred: jnp.ndarray, target: jnp.ndarray,
             topk: int = 1, mask: Optional[jnp.ndarray] = None):
    """Top-k classification accuracy over valid entries."""
    if topk == 1:
        correct = (jnp.argmax(pred, axis=-1) == target)
    else:
        _, idx = jax.lax.top_k(pred, topk)
        correct = jnp.any(idx == target[..., None], axis=-1)
    correct = correct.astype(jnp.float32)
    if mask is not None:
        return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0) * 100
    return jnp.mean(correct) * 100


@LOSSES.register_module()
class MSELoss:
    """(reference: losses/mse_loss.py:15)."""

    def __init__(self, reduction: str = 'mean', loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        loss = (pred.astype(jnp.float32)
                - target.astype(jnp.float32)) ** 2
        if weight is not None and weight.ndim < loss.ndim:
            weight = weight[..., None]
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class BalancedL1Loss:
    """Balanced L1 (Libra R-CNN, reference: balanced_l1_loss.py:12)."""

    def __init__(self, alpha: float = 0.5, gamma: float = 1.5,
                 beta: float = 1.0, reduction: str = 'mean',
                 loss_weight: float = 1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        import numpy as np
        reduction = reduction_override or self.reduction
        diff = jnp.abs(pred.astype(jnp.float32)
                       - target.astype(jnp.float32))
        b = np.e ** (self.gamma / self.alpha) - 1
        loss = jnp.where(
            diff < self.beta,
            self.alpha / b * (b * diff + 1)
            * jnp.log(b * diff / self.beta + 1) - self.alpha * diff,
            self.gamma * diff + self.gamma / b
            - self.alpha * self.beta)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


def _ghm_weights(g, valid, bins, tot, momentum: float = 0.0,
                 acc_sum=None):
    """Gradient-density harmonizing weights (reference: ghm_loss.py
    :78-90), vectorized: histogram by segment-sum, weight =
    tot / density[bin] / n_nonempty_bins. With ``momentum > 0`` and an
    ``acc_sum`` running state, density is the EMA
    ``momentum*acc + (1-momentum)*count`` per non-empty bin (reference
    :83-86); returns (weights, new_acc_sum)."""
    bin_idx = jnp.clip((g * bins).astype(jnp.int32), 0, bins - 1)
    counts = jnp.zeros((bins,), jnp.float32).at[bin_idx].add(
        valid.astype(jnp.float32))
    nonempty = counts > 0
    if momentum > 0 and acc_sum is not None:
        acc_new = jnp.where(nonempty,
                            momentum * acc_sum + (1 - momentum) * counts,
                            acc_sum)
        denom = acc_new
    else:
        acc_new = acc_sum
        denom = counts
    n_valid_bins = jnp.sum(nonempty).astype(jnp.float32)
    w = jnp.where(valid & jnp.take(nonempty, bin_idx),
                  tot / jnp.maximum(jnp.take(denom, bin_idx), 1e-6), 0.0)
    return w / jnp.maximum(n_valid_bins, 1.0), acc_new


@LOSSES.register_module()
class GHMC:
    """GHM classification loss (reference: ghm_loss.py:21). The
    ``momentum > 0`` running ``acc_sum`` is threaded functionally: the
    owning head keeps a flax variable and passes/receives it via the
    ``acc_sum`` kwarg (see AnchorHead.setup); called without it the
    loss runs the momentum=0 per-batch density path."""

    def __init__(self, bins: int = 10, momentum: float = 0,
                 use_sigmoid: bool = True, loss_weight: float = 1.0):
        assert use_sigmoid
        self.bins = bins
        self.momentum = momentum
        self.loss_weight = loss_weight

    def __call__(self, pred, target, label_weight=None, weight=None,
                 avg_factor=None, acc_sum=None, **kwargs):
        pred = pred.astype(jnp.float32)
        if label_weight is None:
            label_weight = weight if weight is not None else \
                jnp.ones_like(pred)
        if target.ndim == pred.ndim - 1:
            lw = label_weight
            if lw.ndim == pred.ndim - 1:
                lw = jnp.broadcast_to(lw[..., None], pred.shape)
            target = _expand_onehot(target, pred.shape[-1])
            label_weight = lw
        target = target.astype(jnp.float32)
        valid = label_weight > 0
        tot = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        g = jnp.abs(jax.lax.stop_gradient(jax.nn.sigmoid(pred)) - target)
        w, acc_new = _ghm_weights(g.reshape(-1), valid.reshape(-1),
                                  self.bins, tot, self.momentum, acc_sum)
        w = w.reshape(pred.shape)
        loss = jnp.sum(_bce_with_logits(pred, target) * w) / tot
        loss = self.loss_weight * loss
        if acc_sum is not None:
            return loss, acc_new
        return loss


@LOSSES.register_module()
class GHMR:
    """GHM regression loss — ASL1 with gradient harmonizing
    (reference: ghm_loss.py:100)."""

    def __init__(self, mu: float = 0.02, bins: int = 10,
                 momentum: float = 0, loss_weight: float = 1.0):
        self.mu = mu
        self.bins = bins
        self.momentum = momentum
        self.loss_weight = loss_weight

    def __call__(self, pred, target, label_weight=None, weight=None,
                 avg_factor=None, acc_sum=None, **kwargs):
        pred = pred.astype(jnp.float32)
        target = target.astype(jnp.float32)
        if label_weight is None:
            label_weight = weight if weight is not None else \
                jnp.ones_like(pred)
        if label_weight.ndim == pred.ndim - 1:
            label_weight = jnp.broadcast_to(label_weight[..., None],
                                            pred.shape)
        mu = self.mu
        diff = pred - target
        loss = jnp.sqrt(diff * diff + mu * mu) - mu
        g = jnp.abs(jax.lax.stop_gradient(
            diff / jnp.sqrt(mu * mu + diff * diff)))
        valid = label_weight > 0
        tot = jnp.maximum(jnp.sum(label_weight.astype(jnp.float32)), 1.0)
        w, acc_new = _ghm_weights(g.reshape(-1), valid.reshape(-1),
                                  self.bins, tot, self.momentum, acc_sum)
        w = w.reshape(pred.shape)
        loss = jnp.sum(loss * w) / tot
        loss = self.loss_weight * loss
        if acc_sum is not None:
            return loss, acc_new
        return loss


@LOSSES.register_module()
class VarifocalLoss:
    """Varifocal loss (reference: losses/varifocal_loss.py:10,
    arXiv:2008.13367): positives weighted by their IoU-aware target,
    negatives by alpha * |sigmoid(p) - q|^gamma."""

    def __init__(self, use_sigmoid: bool = True, alpha: float = 0.75,
                 gamma: float = 2.0, iou_weighted: bool = True,
                 reduction: str = 'mean', loss_weight: float = 1.0):
        assert use_sigmoid
        self.alpha = alpha
        self.gamma = gamma
        self.iou_weighted = iou_weighted
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        pred = pred.astype(jnp.float32)
        target = target.astype(jnp.float32)
        sig = jax.nn.sigmoid(pred)
        pos = (target > 0.0).astype(jnp.float32)
        if self.iou_weighted:
            focal_weight = target * pos + \
                self.alpha * jnp.abs(sig - target) ** self.gamma * (1 - pos)
        else:
            focal_weight = pos + \
                self.alpha * jnp.abs(sig - target) ** self.gamma * (1 - pos)
        loss = _bce_with_logits(pred, target) * focal_weight
        if weight is not None and weight.ndim < loss.ndim:
            weight = weight[..., None]
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class BoundedIoULoss:
    """Bounded IoU loss (reference: losses/iou_loss.py:150
    bounded_iou_loss, arXiv:1711.00164): per-coordinate bounded IoU
    proxies passed through a smooth-L1 envelope. Used by GuidedAnchor's
    shape branch on decoded anchors vs gt."""

    def __init__(self, beta: float = 0.2, eps: float = 1e-3,
                 reduction: str = 'mean', loss_weight: float = 1.0):
        self.beta = beta
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        pred = pred.astype(jnp.float32)
        target = target.astype(jnp.float32)
        px = (pred[..., 0] + pred[..., 2]) * 0.5
        py = (pred[..., 1] + pred[..., 3]) * 0.5
        pw = pred[..., 2] - pred[..., 0]
        ph = pred[..., 3] - pred[..., 1]
        tx = (target[..., 0] + target[..., 2]) * 0.5
        ty = (target[..., 1] + target[..., 3]) * 0.5
        tw = target[..., 2] - target[..., 0]
        th = target[..., 3] - target[..., 1]
        dx = tx - px
        dy = ty - py
        loss_dx = 1 - jnp.maximum(
            (tw - 2 * jnp.abs(dx)) / (tw + 2 * jnp.abs(dx) + self.eps), 0)
        loss_dy = 1 - jnp.maximum(
            (th - 2 * jnp.abs(dy)) / (th + 2 * jnp.abs(dy) + self.eps), 0)
        loss_dw = 1 - jnp.minimum(tw / (pw + self.eps),
                                  pw / (tw + self.eps))
        loss_dh = 1 - jnp.minimum(th / (ph + self.eps),
                                  ph / (th + self.eps))
        comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], -1)
        loss = jnp.where(comb < self.beta,
                         0.5 * comb * comb / self.beta,
                         comb - 0.5 * self.beta)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class GaussianFocalLoss:
    """Focal loss on gaussian-splatted heatmap targets (reference:
    losses/gaussian_focal_loss.py:10; CornerNet arXiv:1808.01244 eq.1).
    ``pred`` is a post-sigmoid probability map."""

    def __init__(self, alpha: float = 2.0, gamma: float = 4.0,
                 reduction: str = 'mean', loss_weight: float = 1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        eps = 1e-12
        pred = pred.astype(jnp.float32)
        target = target.astype(jnp.float32)
        pos_w = (target == 1.0).astype(jnp.float32)
        neg_w = (1 - target) ** self.gamma
        pos_loss = -jnp.log(pred + eps) * (1 - pred) ** self.alpha * pos_w
        neg_loss = -jnp.log(1 - pred + eps) * pred ** self.alpha * neg_w
        loss = pos_loss + neg_loss
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class AssociativeEmbeddingLoss:
    """Associative Embedding pull/push loss (reference: losses/
    ae_loss.py:73; arXiv:1611.05424, CornerNet §3.3). Operates on
    embeddings pre-gathered at the padded gt corner positions with a
    validity mask (the reference's per-image python loop over dynamic
    corner lists becomes a masked pairwise reduction)."""

    def __init__(self, pull_weight: float = 0.25,
                 push_weight: float = 0.25):
        self.pull_weight = pull_weight
        self.push_weight = push_weight

    def __call__(self, tl_emb, br_emb, valid):
        """tl_emb/br_emb: (B, G, M) embeddings at gt corners;
        valid: (B, G). Returns (pull, push) summed over the batch."""
        tl = tl_emb.astype(jnp.float32)
        br = br_emb.astype(jnp.float32)
        v = valid.astype(jnp.float32)                     # (B, G)
        n = jnp.sum(v, axis=1)                            # (B,)
        me = (tl + br) / 2.0                              # (B, G, M)
        pull = jnp.sum(((tl - me) ** 2 + (br - me) ** 2).sum(-1) * v,
                       axis=1) / jnp.maximum(n, 1.0)
        # push: relu(margin - |sum_m(me_i - me_j)|) over valid i != j
        diff = me[:, :, None, :] - me[:, None, :, :]      # (B, G, G, M)
        mat = 1.0 - jnp.abs(diff.sum(-1))                 # margin = 1
        g = tl.shape[1]
        pair = (v[:, :, None] * v[:, None, :] *
                (1.0 - jnp.eye(g)[None]))
        push = jnp.sum(jnp.maximum(mat, 0.0) * pair, axis=(1, 2)) / \
            jnp.maximum(n * (n - 1.0), 1.0)
        push = jnp.where(n > 1, push, 0.0)
        return (self.pull_weight * jnp.sum(pull),
                self.push_weight * jnp.sum(push))


@LOSSES.register_module()
class KnowledgeDistillationKLDivLoss:
    """Temperature-scaled KL divergence (reference: losses/kd_loss.py:39;
    arXiv:1503.02531 / LD arXiv:2102.12252). Matches torch's
    ``F.kl_div(log_softmax(p/T), softmax(q/T)).mean(1) * T²``."""

    def __init__(self, reduction: str = 'mean', loss_weight: float = 1.0,
                 T: float = 10.0):
        assert T >= 1
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.T = float(T)

    def __call__(self, pred, soft_label, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        t = self.T
        logp = jax.nn.log_softmax(pred.astype(jnp.float32) / t, axis=-1)
        q = jax.nn.softmax(
            jax.lax.stop_gradient(soft_label.astype(jnp.float32)) / t,
            axis=-1)
        # q * (log q - log p), with 0 log 0 = 0
        kl = jnp.where(q > 0, q * (jnp.log(jnp.maximum(q, 1e-12)) - logp),
                       0.0)
        loss = kl.mean(-1) * (t * t)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)
