"""SCNet (reference: mmdet/models/roi_heads/scnet_roi_head.py:11,
bbox_heads/scnet_bbox_head.py:6, mask_heads/scnet_mask_head.py,
scnet_semantic_head.py, global_context_head.py:10,
feature_relay_head.py:9; arXiv:2012.10150) — sample-consistency
cascade: semantic branch + global-context branch fused into RoI feats,
and the final bbox stage's shared feature relayed into a single mask
head run once after the cascade.

TPU-native: per-image global-context fusion is a gather over the roi
batch column; positive-slot slicing uses the sampler's fixed
pos-first slot layout."""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import (HEADS, build_head, build_loss,
                       build_roi_extractor)
from ..layers import ConvModule
from .bbox_heads import ConvFCBBoxHead
from .cascade_roi_head import CascadeRoIHead
from .htc_roi_head import FusedSemanticHead
from .mask_heads import FCNMaskHead


class SimplifiedBasicBlock(nn.Module):
    """BasicBlock with NO relu after the residual add (reference:
    models/utils/res_layer.py:105 — conv1 → relu → conv2 → + identity;
    raw convs with bias when norm is absent, so torch keys are
    'conv1.weight'/'conv2.weight')."""
    planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (3, 3), padding=1,
                      dtype=self.dtype, name='conv1')(x)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1,
                      dtype=self.dtype, name='conv2')(out)
        if identity.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), use_bias=False,
                               dtype=self.dtype,
                               name='downsample')(identity)
        return out + identity


def _res_tower(n_blocks, planes, dtype, name_prefix='convs'):
    # the reference packs the blocks in a ResLayer named 'convs'
    return [SimplifiedBasicBlock(planes, dtype=dtype,
                                 name=f'{name_prefix}{i}')
            for i in range(n_blocks)]


@HEADS.register_module()
class SCNetBBoxHead(ConvFCBBoxHead):
    """ConvFCBBoxHead that can also return the shared fc feature
    (reference: scnet_bbox_head.py:6)."""

    def __call__(self, x, train: bool = False,
                 return_shared_feat: bool = False):
        for conv in self.shared_convs:
            x = conv(x, train=train)
        if self.with_avg_pool:
            x = jnp.mean(x, axis=(1, 2))
        x = x.reshape(x.shape[0], -1)
        for fc in self.shared_fcs:
            x = nn.relu(fc(x))
        shared = x
        cls_score = self.fc_cls(x) if self.with_cls else None
        bbox_pred = self.fc_reg(x) if self.with_reg else None
        if return_shared_feat:
            return cls_score, bbox_pred, shared
        return cls_score, bbox_pred


@HEADS.register_module()
class SCNetMaskHead(FCNMaskHead):
    """FCNMaskHead whose conv tower becomes num_convs//2
    SimplifiedBasicBlocks (reference: scnet_mask_head.py — the torch
    ResLayer keeps the 'convs' name, so checkpoint keys line up)."""
    conv_to_res: bool = True

    def _build_convs(self):
        if not self.conv_to_res:
            return super()._build_convs()
        return _res_tower(self.num_convs // 2, self.conv_out_channels,
                          self.dtype)


@HEADS.register_module()
class SCNetSemanticHead(FusedSemanticHead):
    """FusedSemanticHead with the conv→res tower
    (reference: scnet_semantic_head.py — num_convs//2
    SimplifiedBasicBlocks when conv_to_res)."""
    conv_to_res: bool = True


@HEADS.register_module()
class GlobalContextHead(nn.Module):
    """(reference: global_context_head.py:10) — conv tower on the
    coarsest level, global pool, per-class multilabel BCE; the pooled
    vector is added to every roi feature of that image."""
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 80
    loss_weight: float = 1.0
    conv_to_res: bool = False
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        if self.conv_to_res:
            self.tower = _res_tower(self.num_convs // 2,
                                    self.conv_out_channels, self.dtype)
        else:
            self.tower = [
                ConvModule(self.conv_out_channels, 3, padding=1,
                           norm_cfg=self.norm_cfg,
                           act_cfg=dict(type='ReLU'), dtype=self.dtype,
                           name=f'convs{i}')
                for i in range(self.num_convs)]
        self.fc = nn.Dense(self.num_classes, dtype=self.dtype,
                           name='fc')

    def __call__(self, feats, train: bool = False):
        x = feats[-1]
        for layer in self.tower:
            x = layer(x, train=train)
        pooled = jnp.mean(x, axis=(1, 2))               # (B, C)
        mc_pred = self.fc(pooled)
        return mc_pred, pooled

    def loss(self, pred, gt_labels, gt_valid):
        """Multilabel BCE vs the set of present classes."""
        onehot = jax.nn.one_hot(gt_labels, self.num_classes) \
            * gt_valid[..., None]
        target = (jnp.sum(onehot, axis=1) > 0).astype(jnp.float32)
        p = pred.astype(jnp.float32)
        bce = jnp.maximum(p, 0) - p * target + \
            jnp.log1p(jnp.exp(-jnp.abs(p)))
        return self.loss_weight * bce.mean()


@HEADS.register_module()
class FeatureRelayHead(nn.Module):
    """(reference: feature_relay_head.py:9) — fc from the bbox head's
    shared feature back to a (2s, 2s, C) spatial map."""
    in_channels: int = 1024
    out_conv_channels: int = 256
    roi_feat_size: int = 7
    scale_factor: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = x.shape[0]
        s = self.roi_feat_size
        c = self.out_conv_channels
        x = nn.Dense(s * s * c, dtype=self.dtype, name='fc')(x)
        # the torch fc output unflattens CHANNEL-FIRST
        # (feature_relay_head.py:52 reshape(N, C, s, s)) — transpose to
        # NHWC after, or converted fc weights scramble the map
        x = x.reshape(n, c, s, s).transpose(0, 2, 3, 1)
        t = s * self.scale_factor
        # reference upsamples with align_corners=True
        # (feature_relay_head.py:38)
        from ...ops.interpolate import torch_bilinear_resize
        return torch_bilinear_resize(x, (t, t), align_corners=True)


@HEADS.register_module()
class SCNetRoIHead(CascadeRoIHead):
    semantic_roi_extractor: Optional[dict] = None
    semantic_head: Optional[dict] = None
    feat_relay_head: Optional[dict] = None
    glbctx_head: Optional[dict] = None

    def setup(self):
        super().setup()
        if self.semantic_head is not None:
            self._semantic_extractor = build_roi_extractor(
                dict(self.semantic_roi_extractor))
            self._semantic_head = build_head(
                dict(self.semantic_head, dtype=self.dtype))
        if self.feat_relay_head is not None:
            self._feat_relay_head = build_head(
                dict(self.feat_relay_head, dtype=self.dtype))
        if self.glbctx_head is not None:
            self._glbctx_head = build_head(
                dict(self.glbctx_head, dtype=self.dtype))
        # SCNet has ONE mask head run once after the cascade — torch
        # names it 'mask_head' (unindexed). The cascade base's
        # per-stage copies are never called, so they materialize no
        # params; build the real one with the torch-parity name.
        if self.mask_head is not None:
            mh = self.mask_head
            if isinstance(mh, (list, tuple)):
                mh = mh[0]
            self._mask_head = build_head(
                dict(mh, dtype=self.dtype, name='_mask_head'))

    @property
    def with_semantic(self):
        return self.semantic_head is not None

    @property
    def with_glbctx(self):
        return self.glbctx_head is not None

    @property
    def with_feat_relay(self):
        return self.feat_relay_head is not None

    def _fuse(self, roi_feats, rois, sem_feat, glb_feat):
        if sem_feat is not None:
            sem = self._semantic_extractor([sem_feat], rois)
            if sem.shape[1] != roi_feats.shape[1]:
                k = sem.shape[1] // roi_feats.shape[1]
                sem = nn.avg_pool(sem, (k, k), strides=(k, k))
            roi_feats = roi_feats + sem.astype(roi_feats.dtype)
        if glb_feat is not None:
            per_roi = jnp.take(glb_feat, rois[:, 0].astype(jnp.int32),
                               axis=0)                  # (R, C)
            roi_feats = roi_feats + per_roi[:, None, None, :] \
                .astype(roi_feats.dtype)
        return roi_feats

    def forward_dummy(self, feats, num_rois: int = 100):
        rois = jnp.concatenate([
            jnp.zeros((num_rois, 1)),
            jnp.tile(np.asarray([[0., 0., 32., 32.]], np.float32),
                     (num_rois, 1))], axis=-1)
        sem_feat = glb_feat = None
        outs = ()
        if self.with_semantic:
            sem_pred, sem_feat = self._semantic_head(feats)
            outs += (sem_pred,)
        if self.with_glbctx:
            mc, glb_feat = self._glbctx_head(feats)
            outs += (mc,)
        shared = None
        for head in self._bbox_heads:
            bf = self._fuse(self._bbox_extractor(feats, rois), rois,
                            sem_feat, glb_feat)
            cls, reg, shared = head(bf, return_shared_feat=True)
            outs += (cls, reg)
        if self.with_mask:
            mf = self._fuse(self._mask_extractor(feats, rois), rois,
                            sem_feat, glb_feat)
            if self.with_feat_relay:
                mf = mf + self._feat_relay_head(shared)
            outs += (self._mask_head(mf),)
        return outs

    # ---------------------------------------------------------------- train
    def forward_train(self, rng, feats, proposals, proposal_valid,
                      gt_bboxes, gt_valid, gt_labels, gt_masks,
                      img_shapes,
                      gt_semantic_seg=None) -> Dict[str, jnp.ndarray]:
        b = proposals.shape[0]
        losses: Dict[str, jnp.ndarray] = {}
        sem_feat = glb_feat = None
        if self.with_semantic:
            sem_pred, sem_feat = self._semantic_head(feats, train=True)
            if gt_semantic_seg is not None:
                losses['loss_semantic_seg'] = self._semantic_head.loss(
                    sem_pred, gt_semantic_seg)
        if self.with_glbctx:
            mc_pred, glb_feat = self._glbctx_head(feats, train=True)
            losses['loss_glbctx'] = self._glbctx_head.loss(
                mc_pred, gt_labels, gt_valid)

        cur_props, cur_valid = proposals, proposal_valid
        samp = None
        shared = None
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
                                           gt_bboxes, gt_valid,
                                           gt_labels)
            batch_col = jnp.repeat(np.arange(b, dtype=np.float32), num)
            rois = jnp.concatenate(
                [batch_col[:, None], samp.bboxes.reshape(-1, 4)], -1)
            bf = self._fuse(self._bbox_extractor(feats, rois), rois,
                            sem_feat, glb_feat)
            cls_score, bbox_pred, shared = head(
                bf, train=True, return_shared_feat=True)
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

            if stage < self.num_stages - 1:
                bg = head.num_classes
                cls_arg = jnp.argmax(cls_score[:, :-1], axis=-1)
                roi_labels = jnp.where(labels == bg, cls_arg, labels)
                img_shape_per_roi = jnp.repeat(img_shapes, num, axis=0)
                refined = jax.lax.stop_gradient(head.regress_by_class(
                    rois, roi_labels, bbox_pred,
                    (img_shape_per_roi[:, 0:1],
                     img_shape_per_roi[:, 1:2])))
                cur_props = refined[:, 1:].reshape(b, num, 4)
                g = gt_bboxes.shape[1]
                is_gt_slot = (samp.inds < g) & samp.is_pos \
                    if sampler.add_gt_as_proposals else \
                    jnp.zeros_like(samp.is_pos)
                cur_valid = samp.valid & ~is_gt_slot

        if self.with_mask and gt_masks is not None:
            sampler = self._samplers[-1]
            num = sampler.num
            m = int(num * sampler.pos_fraction)
            pos_boxes = samp.bboxes[:, :m]
            pos_inds = samp.pos_gt_inds[:, :m]
            pos_mask = samp.is_pos[:, :m]
            pos_labels = jnp.clip(samp.pos_gt_labels[:, :m], 0)
            mask_rois = jnp.concatenate(
                [jnp.repeat(np.arange(b, dtype=np.float32),
                            m)[:, None],
                 pos_boxes.reshape(-1, 4)], -1)
            mf = self._fuse(self._mask_extractor(feats, mask_rois),
                            mask_rois, sem_feat, glb_feat)
            if self.with_feat_relay:
                # positives are the first m sampler slots per image
                sh = shared.reshape(b, num, -1)[:, :m].reshape(
                    b * m, -1)
                mf = mf + self._feat_relay_head(sh)
            mask_pred = self._mask_head(mf, train=True)
            mask_size = self._stage_cfgs[-1].get('mask_size', 28)
            targets = jax.vmap(
                lambda gm, pb, pi: self._mask_head.get_targets(
                    gm, pb, pi, mask_size))(gt_masks, pos_boxes,
                                            pos_inds)
            mloss = self._mask_head.loss(
                mask_pred, targets.reshape(-1, mask_size, mask_size),
                pos_labels.reshape(-1),
                pos_mask.reshape(-1).astype(jnp.float32))
            losses['loss_mask'] = (mloss['loss_mask'] *
                                   float(sum(self.stage_loss_weights)))
        return losses

    # ----------------------------------------------------------------- test
    def simple_test(self, feats, proposals, proposal_valid, img_shapes,
                    scale_factors, rescale: bool = True):
        sem_feat = glb_feat = None
        if self.with_semantic:
            _, sem_feat = self._semantic_head(feats)
        if self.with_glbctx:
            _, glb_feat = self._glbctx_head(feats)
        b, p = proposals.shape[:2]
        batch_col = jnp.repeat(np.arange(b, dtype=np.float32), p)
        rois = jnp.concatenate(
            [batch_col[:, None], proposals.reshape(-1, 4)], -1)
        img_shape_per_roi = jnp.repeat(img_shapes, p, axis=0)

        ms_scores = []
        bbox_pred = None
        shared = None
        for stage in range(self.num_stages):
            head = self._bbox_heads[stage]
            bf = self._fuse(self._bbox_extractor(feats, rois), rois,
                            sem_feat, glb_feat)
            cls_score, bbox_pred, shared = head(
                bf, return_shared_feat=True)
            ms_scores.append(jax.nn.softmax(
                cls_score.astype(jnp.float32), -1))
            if stage < self.num_stages - 1:
                cls_arg = jnp.argmax(cls_score[:, :-1], axis=-1)
                refined = head.regress_by_class(
                    rois, cls_arg, bbox_pred,
                    (img_shape_per_roi[:, 0:1],
                     img_shape_per_roi[:, 1:2]))
                rois = refined

        scores = sum(ms_scores) / self.num_stages
        head = self._bbox_heads[-1]
        cfg = dict(self.test_cfg)
        nms_res = jax.vmap(
            lambda r, c, bp, sh, sf, v: head.get_bboxes(
                r, c, bp, sh, sf, rescale, cfg, roi_valid=v))(
            rois.reshape(b, p, 5), scores.reshape(b, p, -1),
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
            mf = self._fuse(self._mask_extractor(feats, mask_rois),
                            mask_rois, sem_feat, glb_feat)
            if self.with_feat_relay:
                bf = self._fuse(self._bbox_extractor(feats, mask_rois),
                                mask_rois, sem_feat, glb_feat)
                _, _, det_shared = self._bbox_heads[-1](
                    bf, return_shared_feat=True)
                mf = mf + self._feat_relay_head(det_shared)
            mask_pred = self._mask_head(mf)
            probs = self._mask_head.get_mask_probs(
                mask_pred, nms_res.labels.reshape(-1))
            out['mask_probs'] = probs.reshape(
                b, max_out, probs.shape[1], probs.shape[2])
        return out
