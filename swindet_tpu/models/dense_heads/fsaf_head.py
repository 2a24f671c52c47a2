"""FSAFHead — Feature Selective Anchor-Free (reference:
mmdet/models/dense_heads/fsaf_head.py:15, arXiv:1903.00621): RetinaNet
towers with a single square prior per location, centre-region (0.2)
assignment, TBLR regression, and ONLINE FEATURE SELECTION — each gt
back-propagates only through the pyramid level where its mean loss is
smallest.

Static-shape port: per-level element-wise losses; per-(gt, level) mean
loss via segment-sums over padded gts; the argmin level produces a
reweighting mask (loc zeroed, the gt-class cls channel zeroed) exactly
as the reference's reweight_loss_single.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..builder import HEADS
from ...core.anchors import anchor_inside_flags
from .retina_head import RetinaHead

BIG = 1e6


@HEADS.register_module()
class FSAFHead(RetinaHead):

    @property
    def sampling(self):
        return False

    def forward_single(self, x, train: bool = False):
        cls_score, bbox_pred = super().forward_single(x, train)
        # distances must be positive (reference fsaf_head.py:91 relu +
        # loss-side clamp 1e-4)
        return cls_score, jnp.clip(
            jax.nn.relu(bbox_pred.astype(jnp.float32)), 1e-4)

    def loss(self, rng, cls_scores, bbox_preds, gt_bboxes, gt_valid,
             gt_labels, img_shapes, pad_shapes) -> Dict[str, jnp.ndarray]:
        """(reference: fsaf_head.py loss:177)."""
        featmap_sizes = tuple((s.shape[1], s.shape[2]) for s in cls_scores)
        anchor_list = self.get_anchors(featmap_sizes)
        num_levels = len(anchor_list)
        C = self.cls_out_channels
        b, G = gt_bboxes.shape[:2]
        cfg = self.train_cfg

        def per_image(cls_lvls, box_lvls, gb, gv, gl, img_shape,
                      pad_shape):
            lvl_cls_losses = []     # per-level (N_l, C)
            lvl_reg_losses = []     # per-level (N_l,)
            lvl_assigned = []       # per-level (N_l,) gt idx or -1
            per_gt_level_loss = []  # per-level (G,)
            for lvl in range(num_levels):
                anchors = anchor_list[lvl]
                valid_flags = self.prior_generator.valid_flags(
                    featmap_sizes, pad_shape)[lvl]
                inside = anchor_inside_flags(
                    anchors, valid_flags, img_shape,
                    cfg.get('allowed_border', -1))
                assign, shadowed = self._assigner.assign(
                    anchors, gb, gv, gl, bbox_valid=inside,
                    return_shadowed=True)
                pos = assign.gt_inds > 0
                neg = assign.gt_inds == 0
                gt_idx = jnp.clip(assign.gt_inds - 1, 0, G - 1)
                bg = self.num_classes
                labels = jnp.where(pos, jnp.clip(assign.labels, 0), bg)
                # per-(anchor, class) label weights (reference
                # fsaf_head.py:155 `label_weights[idx_, label_] = 0`):
                # shadowed (anchor, gt) pairs zero that gt's CLASS
                # channel only; shadow-only anchors stay background
                gl_oh = jax.nn.one_hot(jnp.clip(gl.astype(jnp.int32), 0),
                                       C) * gv[:, None]       # (G, C)
                shadow_c = (shadowed.astype(jnp.float32) @ gl_oh) > 0
                lw = ((pos | neg).astype(jnp.float32)[:, None]
                      * (1.0 - shadow_c.astype(jnp.float32)))  # (N, C)

                cls = cls_lvls[lvl].astype(jnp.float32)
                box = box_lvls[lvl].astype(jnp.float32)
                cls_loss = self._loss_cls(
                    cls, labels, weight=lw,
                    reduction_override='none')          # (N, C)
                pos_gt = jnp.take(gb, gt_idx, axis=0)
                decoded = self._bbox_coder.decode(anchors, box)
                reg_loss = self._loss_bbox(
                    decoded, pos_gt,
                    weight=pos.astype(jnp.float32),
                    reduction_override='none')          # (N,)
                if reg_loss.ndim == 2:
                    reg_loss = reg_loss.sum(-1)
                lvl_cls_losses.append(cls_loss)
                lvl_reg_losses.append(reg_loss)
                lvl_assigned.append(jnp.where(pos, gt_idx, -1))

                # per-gt mean (cls_sum + reg) loss at this level
                # (reference collect_loss_level_single:340)
                tot = cls_loss.sum(-1) + reg_loss
                sums = jnp.zeros((G,)).at[gt_idx].add(
                    jnp.where(pos, tot, 0.0))
                cnts = jnp.zeros((G,)).at[gt_idx].add(
                    pos.astype(jnp.float32))
                per_gt_level_loss.append(
                    jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1),
                              BIG))

            # online selection: argmin level per gt (reference :255)
            lvl_loss = jnp.stack(per_gt_level_loss, 0)   # (L, G)
            min_levels = jnp.argmin(lvl_loss, axis=0)    # (G,)

            total_cls = 0.
            total_reg = 0.
            num_pos = 0.
            for lvl in range(num_levels):
                assigned = lvl_assigned[lvl]
                pos = assigned >= 0
                keep = pos & (jnp.take(min_levels,
                                       jnp.clip(assigned, 0)) == lvl)
                drop = pos & ~keep
                # reweight (reference reweight_loss_single:371): zero
                # loc loss and the gt-class cls channel of dropped pos
                reg = jnp.where(keep, lvl_reg_losses[lvl], 0.0)
                gt_lab = jnp.where(
                    pos, jnp.take(jnp.clip(gl.astype(jnp.int32), 0),
                                  jnp.clip(assigned, 0)), 0)
                zero_ch = jax.nn.one_hot(gt_lab, C) * \
                    drop[:, None].astype(jnp.float32)
                cls = lvl_cls_losses[lvl] * (1.0 - zero_ch)
                total_cls += cls.sum()
                total_reg += reg.sum()
                num_pos += keep.sum()
            return total_cls, total_reg, num_pos

        # reshape per level: (B, N_l, C) / (B, N_l, 4)
        cls_lvls = [s.reshape(b, -1, C) for s in cls_scores]
        box_lvls = [p.reshape(b, -1, 4) for p in bbox_preds]

        tc, tr, np_ = jax.vmap(
            lambda *args: per_image(args[:num_levels],
                                    args[num_levels:2 * num_levels],
                                    *args[2 * num_levels:]))(
            *cls_lvls, *box_lvls, gt_bboxes, gt_valid, gt_labels,
            img_shapes, pad_shapes)
        num_pos = jnp.maximum(jnp.sum(np_).astype(jnp.float32), 1.0)
        return dict(loss_cls=jnp.sum(tc) / num_pos,
                    loss_bbox=jnp.sum(tr) / num_pos)
