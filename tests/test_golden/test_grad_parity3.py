"""GRADIENT golden parity, tranche 3 (VERDICT r4 ask #3): the exotic
RoI-head zoo — HTC (semantic fusion + interleaved sampling + mask info
flow), SCNet, Mask Scoring R-CNN, Dynamic R-CNN, PISA, Grid R-CNN and
PointRend — vs torch autograd through the reference models.

RNG is killed with the exhaustive-sampler trick (sampler capacity above
the candidate count → RandomSampler 'take all' in both frameworks).
Two families carry extra RNG beyond sampling and get a documented seam:

- Grid R-CNN: the reference's `_random_jitter` (grid_roi_head.py:37)
  jitters positive boxes with torch.rand. The test monkeypatches the
  torch side to amplitude 0 and sets our `train_cfg.jitter_amplitude=0`
  — the only divergence left is the jitter DISTRIBUTION, which both
  sides implement identically (uniform ±0.15 box-relative).
- PointRend: `get_roi_rel_points_train` (mask_point_head.py:212) draws
  torch.rand point coords. Both sides are pinned to the same regular
  grid (our `train_cfg.point.deterministic_grid_points` seam + a torch
  monkeypatch reproducing the reference's importance-sampling math on
  the grid); oversample=1, importance_ratio=1 keeps the uncertainty
  top-k live while making the final point SET permutation-identical
  (the point loss is a mean over points, hence permutation-invariant).
"""
import copy

import numpy as np
import pytest
import torch

from tests.test_golden import refbridge
from tests.test_golden.common import (grad_parity, tiny_cascade_cfg,
                                      tiny_maskrcnn_cfg)

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')

HW = (64, 96)


def _exhaustive(cfg):
    cfg = copy.deepcopy(cfg)
    cfg['train_cfg']['rpn']['sampler']['num'] = 2048
    rcnn = cfg['train_cfg']['rcnn']
    for st in (rcnn if isinstance(rcnn, list) else [rcnn]):
        st['sampler']['num'] = 128
    return cfg


def _htc_cfg(with_semantic=True):
    """HTC mutation of the golden cascade config (reference:
    configs/htc/htc_r50_fpn_1x_coco.py, htc_roi_head.py:11)."""
    base = tiny_cascade_cfg(with_mask=True)
    rh = base['roi_head']
    rh['type'] = 'HybridTaskCascadeRoIHead'
    rh['interleaved'] = True
    rh['mask_info_flow'] = True
    mh = rh['mask_head']
    mh = [dict(mh) for _ in range(3)]
    for i, h in enumerate(mh):
        h['type'] = 'HTCMaskHead'
        h['with_conv_res'] = i > 0
    rh['mask_head'] = mh
    if with_semantic:
        out_ch = rh['bbox_roi_extractor']['out_channels']
        rh['semantic_roi_extractor'] = dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=14,
                           sampling_ratio=0),
            out_channels=out_ch, featmap_strides=[8])
        rh['semantic_head'] = dict(
            type='FusedSemanticHead', num_ins=5, fusion_level=1,
            num_convs=2, in_channels=out_ch, conv_out_channels=out_ch,
            num_classes=8, ignore_label=255, loss_weight=0.2)
    base['type'] = 'HybridTaskCascade'
    return base


@pytest.fixture
def oop_semantic_fusion(monkeypatch):
    """torch>=1.8 cannot backward the reference's semantic fusion
    (fused_semantic_head.py:66 ``x += lateral(feat)`` mutates a ReLU
    output whose result is saved for backward — RuntimeError under
    autograd's version check). Same math, out-of-place."""
    refbridge.install()
    import torch.nn.functional as F
    from mmdet.models.roi_heads.mask_heads.fused_semantic_head import \
        FusedSemanticHead

    def fwd(self, feats):
        x = self.lateral_convs[self.fusion_level](
            feats[self.fusion_level])
        fused_size = tuple(x.shape[-2:])
        for i, feat in enumerate(feats):
            if i != self.fusion_level:
                feat = F.interpolate(feat, size=fused_size,
                                     mode='bilinear', align_corners=True)
                x = x + self.lateral_convs[i](feat)
        for i in range(self.num_convs):
            x = self.convs[i](x)
        mask_pred = self.conv_logits(x)
        x = self.conv_embedding(x)
        return mask_pred, x

    monkeypatch.setattr(FusedSemanticHead, 'forward', fwd)


def test_grad_parity_htc(oop_semantic_fusion):
    grad_parity(_exhaustive(_htc_cfg(True)), img_hw=HW, with_mask=True,
                with_semantic=True)


def test_grad_parity_htc_no_semantic():
    """Interleave + mask info flow without the aux branch."""
    grad_parity(_exhaustive(_htc_cfg(False)), img_hw=HW, with_mask=True)


def _scnet_cfg():
    """SCNet mutation (reference: configs/scnet/scnet_r50_fpn_1x,
    scnet_roi_head.py)."""
    base = tiny_cascade_cfg(with_mask=True)
    rh = base['roi_head']
    rh['type'] = 'SCNetRoIHead'
    out_ch = rh['bbox_roi_extractor']['out_channels']
    for h in rh['bbox_head']:
        h['type'] = 'SCNetBBoxHead'
        # SCNetBBoxHead is a plain ConvFCBBoxHead (no Shared2FC sugar):
        # the shipped recipe sets the 2 shared fcs explicitly
        # (configs/scnet/scnet_r50_fpn_1x_coco.py)
        h['num_shared_fcs'] = 2
    rh['mask_head'] = dict(
        type='SCNetMaskHead', num_convs=2, in_channels=out_ch,
        conv_out_channels=out_ch, num_classes=4, conv_to_res=True,
        loss_mask=dict(type='CrossEntropyLoss', use_mask=True,
                       loss_weight=1.0))
    rh['semantic_roi_extractor'] = dict(
        type='SingleRoIExtractor',
        roi_layer=dict(type='RoIAlign', output_size=14,
                       sampling_ratio=0),
        out_channels=out_ch, featmap_strides=[8])
    rh['semantic_head'] = dict(
        type='SCNetSemanticHead', num_ins=5, fusion_level=1,
        num_convs=2, in_channels=out_ch, conv_out_channels=out_ch,
        num_classes=8, ignore_label=255, loss_weight=0.2)
    rh['glbctx_head'] = dict(
        type='GlobalContextHead', num_convs=2, in_channels=out_ch,
        conv_out_channels=out_ch, num_classes=4, loss_weight=3.0)
    rh['feat_relay_head'] = dict(
        type='FeatureRelayHead',
        in_channels=rh['bbox_head'][0]['fc_out_channels'],
        out_conv_channels=out_ch, roi_feat_size=7, scale_factor=2)
    base['type'] = 'SCNet'
    return base


def test_grad_parity_scnet(oop_semantic_fusion):
    cfg = _exhaustive(_scnet_cfg())
    # SCNet's mask branch runs on the positive slots, capped at
    # num*pos_fraction. Under the exhaustive sampler the stage-2
    # positive count can exceed that cap (production sampling cannot —
    # the sampler itself enforces it), silently truncating positives on
    # our side while torch keeps all. Raise num so the cap clears the
    # worst-case positive count.
    for st in cfg['train_cfg']['rcnn']:
        st['sampler']['num'] = 192
    grad_parity(cfg, img_hw=HW, with_mask=True, with_semantic=True)


def test_grad_parity_mask_scoring():
    cfg = tiny_maskrcnn_cfg(with_mask=True)
    cfg['type'] = 'MaskScoringRCNN'
    cfg['roi_head']['type'] = 'MaskScoringRoIHead'
    out_ch = cfg['roi_head']['bbox_roi_extractor']['out_channels']
    cfg['roi_head']['mask_iou_head'] = dict(
        type='MaskIoUHead', num_convs=2, num_fcs=1, roi_feat_size=14,
        in_channels=out_ch, conv_out_channels=out_ch,
        fc_out_channels=32, num_classes=4)
    cfg = _exhaustive(cfg)
    # the reference's mask-iou target binarizes predicted masks with
    # rcnn_train_cfg.mask_thr_binary (mask_scoring configs set it)
    cfg['train_cfg']['rcnn']['mask_thr_binary'] = 0.5
    grad_parity(cfg, img_hw=HW, with_mask=True)


def test_grad_parity_dynamic_rcnn():
    cfg = tiny_maskrcnn_cfg(with_mask=False)
    cfg['type'] = 'FasterRCNN'
    cfg['roi_head'].pop('mask_head', None)
    cfg['roi_head'].pop('mask_roi_extractor', None)
    cfg['roi_head']['type'] = 'DynamicRoIHead'
    cfg['roi_head']['bbox_head']['loss_bbox'] = dict(
        type='SmoothL1Loss', beta=1.0, loss_weight=1.0)
    # the reference reads the INITIAL dynamic thresholds from the
    # assigner/loss cfg itself (configs/dynamic_rcnn sets the assigner
    # to 0.4); keep both sides at the same operating point
    cfg['train_cfg']['rcnn']['assigner'].update(
        pos_iou_thr=0.4, neg_iou_thr=0.4, min_pos_iou=0.4)
    cfg['train_cfg']['rcnn']['dynamic_rcnn'] = dict(
        iou_topk=8, beta_topk=2, update_iter_interval=100,
        initial_iou=0.4, initial_beta=1.0)
    grad_parity(_exhaustive(cfg), img_hw=HW)


def test_grad_parity_pisa():
    cfg = tiny_maskrcnn_cfg(with_mask=False)
    cfg['type'] = 'FasterRCNN'
    cfg['roi_head'].pop('mask_head', None)
    cfg['roi_head'].pop('mask_roi_extractor', None)
    cfg['roi_head']['type'] = 'PISARoIHead'
    cfg['train_cfg']['rcnn']['isr'] = dict(k=2, bias=0)
    cfg['train_cfg']['rcnn']['carl'] = dict(k=1, bias=0.2)
    # ISR ranks positives by IoU within their class; gt-as-proposal
    # boxes all have IoU exactly 1.0, so two same-class gts tie and the
    # frameworks may legitimately rank them differently. Seed 3 gives
    # distinct labels per image -> tie-free ranks.
    grad_parity(_exhaustive(cfg), img_hw=HW, input_seed=3)


def test_grad_parity_grid_rcnn():
    cfg = tiny_maskrcnn_cfg(with_mask=False)
    cfg['type'] = 'GridRCNN'
    cfg['roi_head'].pop('mask_head', None)
    cfg['roi_head'].pop('mask_roi_extractor', None)
    cfg['roi_head']['type'] = 'GridRoIHead'
    out_ch = cfg['roi_head']['bbox_roi_extractor']['out_channels']
    # grid replaces the bbox-reg branch (reference grid_rcnn configs)
    cfg['roi_head']['bbox_head'] = dict(
        cfg['roi_head']['bbox_head'], with_reg=False)
    cfg['roi_head']['grid_roi_extractor'] = dict(
        type='SingleRoIExtractor',
        roi_layer=dict(type='RoIAlign', output_size=14,
                       sampling_ratio=0),
        out_channels=out_ch, featmap_strides=[4, 8, 16, 32])
    cfg['roi_head']['grid_head'] = dict(
        type='GridHead', grid_points=9, num_convs=2,
        in_channels=out_ch, point_feat_channels=8,
        norm_cfg=dict(type='GN', num_groups=9),
        loss_grid=dict(type='CrossEntropyLoss', use_sigmoid=True,
                       loss_weight=15))
    cfg = _exhaustive(cfg)
    cfg['train_cfg']['rcnn']['jitter_amplitude'] = 0.0   # seam (ours)
    cfg['train_cfg']['rcnn']['pos_radius'] = 1
    cfg['train_cfg']['rcnn']['max_num_grid'] = 192

    # seam (torch): amplitude-0 jitter — same positives, no rand
    refbridge.install()
    from mmdet.models.roi_heads.grid_roi_head import GridRoIHead as Ref
    orig = Ref._random_jitter
    Ref._random_jitter = lambda self, res, metas, amplitude=0.15: \
        orig(self, res, metas, amplitude=0.0)
    try:
        # the grid-head subtree sits behind a GroupNorm whose backward
        # cancels on the near-constant init heatmaps: TORCH'S OWN fp32
        # grads deviate 18-39% from its fp64 grads there (measured on
        # convs/deconv1/norm1). Compare that subtree at the loose bound
        # (still catches wrong-by-construction grads); the grid targets
        # are separately pinned element-exact
        # (test_grid_target_parity.py) and all other leaves stay at
        # 1e-4.
        grad_parity(cfg, img_hw=HW,
                    loose_prefixes=('_roi_head/_grid_head',))
    finally:
        Ref._random_jitter = orig


def test_grad_parity_point_rend():
    cfg = tiny_maskrcnn_cfg(with_mask=True)
    cfg['type'] = 'PointRend'
    rh = cfg['roi_head']
    rh['type'] = 'PointRendRoIHead'
    out_ch = rh['bbox_roi_extractor']['out_channels']
    rh['mask_roi_extractor'] = dict(
        type='SingleRoIExtractor',
        roi_layer=dict(type='RoIAlign', output_size=14,
                       sampling_ratio=0),
        out_channels=out_ch, featmap_strides=[4])
    rh['mask_head'] = dict(
        type='CoarseMaskHead', num_fcs=2, in_channels=out_ch,
        conv_out_channels=out_ch, fc_out_channels=64, num_classes=4,
        loss_mask=dict(type='CrossEntropyLoss', use_mask=True,
                       loss_weight=1.0))
    rh['point_head'] = dict(
        type='MaskPointHead', num_fcs=3, in_channels=out_ch,
        fc_channels=32, num_classes=4,
        coarse_pred_each_layer=True,
        loss_point=dict(type='CrossEntropyLoss', use_mask=True,
                        loss_weight=1.0))
    cfg = _exhaustive(cfg)
    cfg['train_cfg']['rcnn'].update(
        mask_size=7, num_points=16, oversample_ratio=1.0,
        importance_sample_ratio=1.0,
        deterministic_grid_points=True)   # seam (ours)

    # seam (torch): reproduce get_roi_rel_points_train with the grid
    # instead of torch.rand (reference mask_point_head.py:212); the
    # importance-sampling top-k stays live on both sides
    refbridge.install()
    from mmdet.models.roi_heads.mask_heads.mask_point_head import \
        MaskPointHead as Ref
    orig = Ref.get_roi_rel_points_train

    def grid_points(self, mask_pred, labels, cfg=None):
        cfg_ = cfg
        import math
        from mmcv.ops import point_sample
        num_points = cfg_.num_points
        n_samp = int(num_points * cfg_.oversample_ratio)
        s = max(int(math.ceil(math.sqrt(n_samp))), 1)
        xs = (torch.arange(s, dtype=torch.float32) + 0.5) / s
        gy, gx = torch.meshgrid(xs, xs)   # row-major like jnp 'xy'
        grid = torch.stack([gx.reshape(-1), gy.reshape(-1)],
                           -1)[:n_samp]
        bsz = mask_pred.shape[0]
        coords = grid[None].expand(bsz, n_samp, 2).contiguous()
        logits = point_sample(mask_pred, coords)
        unc = self._get_uncertainty(logits, labels)
        n_imp = int(cfg_.importance_sample_ratio * num_points)
        idx = torch.topk(unc[:, 0, :], k=n_imp, dim=1)[1]
        shift = n_samp * torch.arange(bsz, dtype=torch.long)
        idx = idx + shift[:, None]
        return coords.view(-1, 2)[idx.view(-1)].view(bsz, n_imp, 2)

    Ref.get_roi_rel_points_train = grid_points
    try:
        grad_parity(cfg, img_hw=HW, with_mask=True)
    finally:
        Ref.get_roi_rel_points_train = orig
