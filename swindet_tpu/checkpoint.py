"""Checkpointing: torch ``.pth`` conversion + orbax-native save/load.

Converter replicates the reference's custom loader semantics
(reference: mmcv_custom/checkpoint.py:286 — 'module.'/'encoder.' prefix
stripping :319-324, absolute_pos_embed reshape :327-334, bicubic
relative_position_bias_table interpolation on window mismatch :336-352,
non-strict load with missing/unexpected report :41-112) plus the
torch→flax layout changes:

- conv weight OIHW → HWIO
- dense weight (out, in) → (in, out)
- deconv weight (in, out, kh, kw) → (kh, kw, in, out), spatially flipped
  (torch ConvTranspose2d correlates with the flipped kernel relative to
  lax.conv_transpose)
- first FC after a spatial feature map: input dim reordered CHW → HWC
- norms: weight → scale

Native checkpoints (ours) are orbax: full variables + train state.
"""
from __future__ import annotations

import os
import os.path as osp
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .utils.logger import get_root_logger

# flax module name → torch prefix
_NAME_MAP = {
    '_backbone': 'backbone',
    '_neck': 'neck',
    '_rpn_head': 'rpn_head',
    '_roi_head': 'roi_head',
    '_bbox_head': 'bbox_head',
    '_mask_head': 'mask_head',
    '_bbox_extractor': 'bbox_roi_extractor',
    '_mask_extractor': 'mask_roi_extractor',
}
_INDEXED = re.compile(
    r'^(layers|blocks|lateral_convs|fpn_convs|shared_convs|shared_fcs|'
    r'convs|cls_convs|reg_convs|cls_fcs|reg_fcs|bbox_head|mask_head|'
    r'reppoints_cls_convs|reppoints_pts_convs|head_convs|'
    r'convs_bridge|convs_pred|fcs)(\d+)$')


def flax_path_to_torch_key(path: Tuple[str, ...]) -> str:
    """('_backbone', 'layers0', 'blocks1', 'attn', 'qkv', 'kernel') →
    'backbone.layers.0.blocks.1.attn.qkv.weight'."""
    parts: List[str] = []
    for p in path[:-1]:
        p = _NAME_MAP.get(p, p)
        if p.startswith('_'):
            # flax submodule attrs are underscore-prefixed versions of
            # the torch names (incl. indexed ones like _bbox_head0)
            p = p[1:]
        m = _INDEXED.match(p)
        if m:
            parts.append(f'{m.group(1)}.{m.group(2)}')
        else:
            parts.append(p)
    leaf = path[-1]
    leaf_map = {'kernel': 'weight', 'scale': 'weight', 'bias': 'bias',
                'embedding': 'weight',
                'relative_position_bias_table':
                    'relative_position_bias_table',
                'absolute_pos_embed': 'absolute_pos_embed',
                'mean': 'running_mean', 'var': 'running_var'}
    parts.append(leaf_map.get(leaf, leaf))
    key = '.'.join(parts)
    # flax BatchNorm lives under .../bn/...; torch folds it into the module
    key = key.replace('.bn.', '.')
    # anonymous norm wrappers inside ConvModule: mmcv names them by kind
    # (conv_module.py norm_name = 'gn' | 'bn')
    key = key.replace('.norm.GroupNorm_0.', '.gn.')
    key = key.replace('.norm.BatchNorm_0.', '.bn.')
    # norm wrapper modules keep their name; drop duplicated segments
    return key


def _interp_bias_table(table: np.ndarray, target_len: int,
                       nh: int) -> np.ndarray:
    """Bicubic-resize a ((2w-1)^2, nH) bias table to a new window size
    (reference: mmcv_custom/checkpoint.py:336-352)."""
    import cv2
    s1 = int(np.sqrt(table.shape[0]))
    s2 = int(np.sqrt(target_len))
    t = table.reshape(s1, s1, nh)
    t = cv2.resize(t, (s2, s2), interpolation=cv2.INTER_CUBIC)
    if t.ndim == 2:
        t = t[..., None]
    return t.reshape(s2 * s2, nh)


def _translate_detr_keys(sd: Dict[str, np.ndarray]
                         ) -> Dict[str, np.ndarray]:
    """Rewrite reference DETR transformer keys (mmdet/models/utils/
    transformer.py — torch nn.MultiheadAttention with packed
    in_proj_weight, FFN layers.{0.0,1}, per-layer norms ModuleList)
    into this framework's naming (models/transformer.py — enc{i}/dec{i}
    with split q/k/v/out projections, ffn.fc{i}, norm{1..3}).
    No-op for checkpoints without '.in_proj_weight' keys."""
    if not any(k.endswith('.in_proj_weight') for k in sd):
        return sd
    out: Dict[str, np.ndarray] = {}

    def attn_name(stage, seg):
        if stage == 'encoder':
            return 'self_attn'
        return 'self_attn' if seg == 'self_attn' else 'cross_attn'

    for k, v in sd.items():
        m = re.match(
            r'^(.*transformer)\.(encoder|decoder)\.layers\.(\d+)\.(.+)$',
            k)
        if m is None:
            # head-level DETR leaves
            if k.endswith('query_embedding.weight'):
                out[k[:-len('.weight')]] = v
            elif re.search(r'reg_ffn\.layers\.0\.0\.(weight|bias)$', k):
                out[re.sub(r'reg_ffn\.layers\.0\.0\.', 'reg_ffn0.', k)] \
                    = v
            elif re.search(r'reg_ffn\.layers\.1\.(weight|bias)$', k):
                out[re.sub(r'reg_ffn\.layers\.1\.', 'reg_ffn1.', k)] = v
            elif re.search(r'\.input_proj\.weight$', k) and v.ndim == 4:
                out[k] = v[:, :, 0, 0]   # 1x1 Conv2d → Dense
            elif re.search(r'transformer\.decoder\.norm\.', k):
                out[k.replace('transformer.decoder.norm.',
                              'transformer.dec_norm.')] = v
            else:
                out[k] = v
            continue
        base, stage, idx, rest = m.groups()
        pre = f'{base}.{"enc" if stage == "encoder" else "dec"}{idx}'
        am = re.match(r'^(self_attn|multihead_attn)\.attn\.(.+)$', rest)
        if am:
            a = attn_name(stage, am.group(1))
            leaf = am.group(2)
            if leaf in ('in_proj_weight', 'in_proj_bias'):
                d = v.shape[0] // 3
                suffix = 'weight' if leaf == 'in_proj_weight' else 'bias'
                for j, p in enumerate(('q_proj', 'k_proj', 'v_proj')):
                    out[f'{pre}.{a}.{p}.{suffix}'] = v[j * d:(j + 1) * d]
            else:  # out_proj.weight / out_proj.bias
                out[f'{pre}.{a}.{leaf}'] = v
            continue
        fm = re.match(r'^ffn\.layers\.0\.0\.(weight|bias)$', rest)
        if fm:
            out[f'{pre}.ffn.fc0.{fm.group(1)}'] = v
            continue
        fm = re.match(r'^ffn\.layers\.1\.(weight|bias)$', rest)
        if fm:
            out[f'{pre}.ffn.fc1.{fm.group(1)}'] = v
            continue
        nm = re.match(r'^norms\.(\d+)\.(weight|bias)$', rest)
        if nm:
            out[f'{pre}.norm{int(nm.group(1)) + 1}.{nm.group(2)}'] = v
            continue
        out[k] = v
    return out


def _translate_ssd_vgg_keys(sd: Dict[str, np.ndarray]
                            ) -> Dict[str, np.ndarray]:
    """Rewrite reference SSDVGG keys (mmdet/models/backbones/
    ssd_vgg.py — one flat torch `features` Sequential incl. the dilated
    fc6/fc7, `extra` list, `l2_norm`) into this framework's naming
    (models/backbones/ssd_vgg.py — features{conv#}, fc6, fc7,
    extra{i}, l2_norm_scale_param). No-op without an fc6 at
    features.31."""
    if not any(k.endswith('features.31.weight') for k in sd):
        return sd
    # VGG-16 conv positions in the torch Sequential (conv,relu pairs +
    # a pool per stage, last pool dropped): stages (2,2,3,3,3)
    conv_pos = []
    idx = 0
    for n in (2, 2, 3, 3, 3):
        for _ in range(n):
            conv_pos.append(idx)
            idx += 2
        idx += 1                       # MaxPool
    pos_to_name = {p: f'features{i}' for i, p in enumerate(conv_pos)}
    pos_to_name[31] = 'fc6'
    pos_to_name[33] = 'fc7'
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        m = re.match(r'^(.*?)features\.(\d+)\.(weight|bias)$', k)
        if m and int(m.group(2)) in pos_to_name:
            out[f'{m.group(1)}{pos_to_name[int(m.group(2))]}'
                f'.{m.group(3)}'] = v
        elif re.search(r'\.l2_norm\.weight$', k):
            out[k.replace('.l2_norm.weight', '.l2_norm_scale_param')] = v
        else:
            m = re.match(r'^(.*?)extra\.(\d+)\.(weight|bias)$', k)
            if m:
                out[f'{m.group(1)}extra{m.group(2)}.{m.group(3)}'] = v
            else:
                out[k] = v
    return out


def _translate_sparse_rcnn_keys(sd: Dict[str, np.ndarray]
                                ) -> Dict[str, np.ndarray]:
    """Rewrite reference Sparse R-CNN keys (roi_heads/bbox_heads/
    dii_head.py + dense_heads/embedding_rpn_head.py) into this
    framework's naming (models/roi_heads/sparse_roi_head.py): packed
    attention in_proj split to q/k/v, FFN layer renames, cls/reg tower
    Linear/LN flattening, Embedding '.weight' drop. No-op without a
    DIIHead dynamic_layer key."""
    if not any('instance_interactive_conv.dynamic_layer' in k
               for k in sd):
        return sd
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        m = re.match(r'^(.*attention)\.attn\.in_proj_(weight|bias)$', k)
        if m:
            d = v.shape[0] // 3
            for j, p in enumerate(('q_proj', 'k_proj', 'v_proj')):
                out[f'{m.group(1)}.{p}.{m.group(2)}'] = \
                    v[j * d:(j + 1) * d]
            continue
        k2 = re.sub(r'(\.attention)\.attn\.out_proj\.', r'\1.out_proj.',
                    k)
        k2 = k2.replace('instance_interactive_conv_norm.', 'iic_norm.')
        k2 = re.sub(r'\.ffn\.layers\.0\.0\.', '.ffn.fc0.', k2)
        k2 = re.sub(r'\.ffn\.layers\.1\.', '.ffn.fc1.', k2)
        m = re.match(r'^(.*\.)(cls|reg)_fcs\.(\d+)\.(weight|bias)$', k2)
        if m:
            idx = int(m.group(3))
            kind = 'fc' if idx % 3 == 0 else 'ln'
            k2 = (f'{m.group(1)}{m.group(2)}_{kind}{idx // 3}'
                  f'.{m.group(4)}')
        k2 = re.sub(r'(init_proposal_(?:bboxes|features))\.weight$',
                    r'\1', k2)
        out[k2] = v
    return out


def _translate_hourglass_keys(sd: Dict[str, np.ndarray]
                              ) -> Dict[str, np.ndarray]:
    """Rewrite reference HourglassNet/CornerHead/CentripetalHead keys
    into this framework's naming. Torch side (mmdet/models/backbones/
    hourglass.py:128-160): ``stem`` Sequential(ConvModule, ResLayer),
    ``hourglass_modules``/``conv1x1s``/``out_convs``/``remap_convs``
    ModuleLists and one ``inters`` ResLayer indexed per stack; inside a
    HourglassModule the up1/low1/low2/low3 ResLayers hold integer block
    indices. Head side (dense_heads/corner_head.py:144-199,
    centripetal_head.py:73-121): per-level ModuleLists whose branches
    are Sequential(ConvModule, Conv2d). Flax side
    (models/backbones/hourglass.py, dense_heads/corner_head.py):
    ``stem0/stem1.blockM``, ``hourglassN.(low2.)*{up1..}.blockM``,
    ``interN.block0``, ``conv1x1_N/outN/remapN``, branch
    ``{tl,br}_{heat,emb,off}N.{conv0,out}``. No-op for checkpoints
    without a ``hourglass_modules.`` key."""
    if not any('hourglass_modules.' in k for k in sd):
        return sd
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        k = re.sub(r'\bstem\.0\.', 'stem0.', k)
        k = re.sub(r'\bstem\.1\.(\d+)\.', r'stem1.block\1.', k)
        k = re.sub(r'\bhourglass_modules\.(\d+)\.', r'hourglass\1.', k)
        # block index of the innermost ResLayer (one per key)
        k = re.sub(r'\.(up1|low1|low2|low3)\.(\d+)\.',
                   r'.\1.block\2.', k)
        k = re.sub(r'\binters\.(\d+)\.', r'inter\1.block0.', k)
        k = re.sub(r'\bconv1x1s\.(\d+)\.', r'conv1x1_\1.', k)
        k = re.sub(r'\bout_convs\.(\d+)\.', r'out\1.', k)
        k = re.sub(r'\bremap_convs\.(\d+)\.', r'remap\1.', k)
        # corner branches: Sequential(ConvModule, Conv2d) → conv0/out
        k = re.sub(r'\b(tl|br)_(heat|emb|off)\.(\d+)\.0\.',
                   r'\1_\2\3.conv0.', k)
        # second branch layer is a norm-less ConvModule in torch
        # (corner_head.py:148-149) but a bare Conv here → drop '.conv'
        k = re.sub(r'\b(tl|br)_(heat|emb|off)\.(\d+)\.1\.conv\.',
                   r'\1_\2\3.out.', k)
        k = re.sub(r'\b(tl|br)_pool\.(\d+)\.', r'\1_pool\2.', k)
        # centripetal extras
        k = re.sub(r'\b(tl|br)_(guiding|centripetal)_shift\.(\d+)\.0\.',
                   r'\1_\2\3.conv0.', k)
        k = re.sub(
            r'\b(tl|br)_(guiding|centripetal)_shift\.(\d+)\.1\.conv\.',
            r'\1_\2\3.out.', k)
        k = re.sub(r'\b(tl|br)_feat_adaption\.(\d+)\.',
                   r'\1_adaption\2.', k)
        k = re.sub(r'\b(tl|br)_dcn_offset\.(\d+)\.conv\.',
                   r'\1_dcn_offset\2.', k)
        out[k] = v
    return out


def _translate_dpool_keys(sd: Dict[str, np.ndarray]
                          ) -> Dict[str, np.ndarray]:
    """Rewrite mmcv DeformRoIPoolPack keys (one pack per FPN level,
    ``roi_layers.{l}.{offset|mask}_fc.{i}``, Sequential indices 0/2/4 =
    Linear layers) into this framework's flat per-level names
    (models/roi_heads/roi_extractor.py DeformRoIExtractor:
    ``roi_layers{l}_{offset|mask}_{fc1|fc2|out}``). No-op without an
    offset_fc key."""
    if not any('.offset_fc.' in k for k in sd):
        return sd
    seq_map = {'offset': {0: 'fc1', 2: 'fc2', 4: 'out'},
               'mask': {0: 'fc1', 2: 'out'}}
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        m = re.match(
            r'^(.*roi_layers)\.(\d+)\.(offset|mask)_fc\.(\d+)\.'
            r'(weight|bias)$', k)
        if m:
            part = seq_map[m.group(3)].get(int(m.group(4)))
            if part is not None:
                k = (f'{m.group(1)}{m.group(2)}_{m.group(3)}_{part}'
                     f'.{m.group(5)}')
        out[k] = v
    return out


def _translate_grid_head_keys(sd: Dict[str, np.ndarray]
                              ) -> Dict[str, np.ndarray]:
    """Grid R-CNN GridHead (reference: mask_heads/grid_head.py):
    - forder_trans.{i}.{j}.{0|1}.*  (Sequential dw5x5 + pw1x1)
        → fo_dw_{i}_{j}.* / fo_pw_{i}_{j}.*  (same for sorder_trans)
    - deconv1 / deconv2 GROUPED ConvTranspose2d (groups=grid_points)
        → per-point deconv{n}_{i} slices (torch grouped weight is
          (in_total, out_per_group, kh, kw) with group g owning input
          rows [g·in_g, (g+1)·in_g))."""
    if not any('grid_head.forder_trans' in k for k in sd):
        return sd
    out = {}
    # grid_points from deconv2's bias (out_per_group=1 → len == G)
    g_pts = None
    for k, v in sd.items():
        if k.endswith('grid_head.deconv2.bias'):
            g_pts = int(v.shape[0])
    for k, v in sd.items():
        m = re.match(r'^(.*grid_head\.)(forder_trans|sorder_trans)\.'
                     r'(\d+)\.(\d+)\.([01])\.(weight|bias)$', k)
        if m:
            pre, kind, i, j, idx, leaf = m.groups()
            tag = 'fo' if kind == 'forder_trans' else 'so'
            sub = 'dw' if idx == '0' else 'pw'
            out[f'{pre}{tag}_{sub}_{i}_{j}.{leaf}'] = v
            continue
        m = re.match(r'^(.*grid_head\.)deconv([12])\.(weight|bias)$', k)
        if m and g_pts:
            pre, n, leaf = m.groups()
            if leaf == 'weight':
                in_g = v.shape[0] // g_pts
                for i in range(g_pts):
                    out[f'{pre}deconv{n}_{i}.weight'] = \
                        v[i * in_g:(i + 1) * in_g]
            else:
                out_g = v.shape[0] // g_pts
                for i in range(g_pts):
                    out[f'{pre}deconv{n}_{i}.bias'] = \
                        v[i * out_g:(i + 1) * out_g]
            continue
        out[k] = v
    return out


def convert_torch_state_dict(
        state_dict: Dict[str, Any],
        params: Dict,
        flatten_hints: Optional[Dict[str, Tuple[int, int, int]]] = None,
        logger=None,
        batch_stats: Optional[Dict] = None):
    """Map a torch state_dict onto a flax params tree.

    flatten_hints: flax-path-prefix → (h, w, c) of the spatial feature
    each first-FC consumes (for CHW→HWC input reorder).
    batch_stats: optional flax ``batch_stats`` collection; when given,
    torch BN ``running_mean``/``running_var`` buffers are mapped onto it
    (leaves named ``mean``/``var``) and the return value becomes
    (new params, new batch_stats, report) instead of (new params,
    report).
    Returns (new params tree[, new batch_stats tree], report dict with
    missing/unexpected keys).
    """
    logger = logger or get_root_logger()
    sd = {}
    for k, v in state_dict.items():
        if k.startswith('module.'):
            k = k[len('module.'):]
        if k.startswith('encoder.'):  # MoBY SSL checkpoints
            k = k[len('encoder.'):]
        # np.array (copy) rather than np.asarray: torch .numpy() views
        # share storage with the live tensor, and jnp.asarray is
        # zero-copy for aligned fp64 on CPU — converting a LIVE model's
        # state_dict must snapshot, or a later in-place optimizer step
        # would mutate the converted tree
        sd[k] = np.array(v.numpy() if hasattr(v, 'numpy') else v)

    sd = _translate_detr_keys(sd)
    sd = _translate_ssd_vgg_keys(sd)
    sd = _translate_sparse_rcnn_keys(sd)
    sd = _translate_hourglass_keys(sd)
    sd = _translate_dpool_keys(sd)
    sd = _translate_grid_head_keys(sd)

    # per-level torch Scale modules (fcos/atss/gfl/vfnet heads:
    # `scales.{i}.scale` scalar each) → our single (L,) 'scales' vector
    scale_groups: Dict[str, Dict[int, np.ndarray]] = {}
    for k in list(sd):
        m = re.match(r'^(.*\.scales(?:_refine)?)\.(\d+)\.scale$', k)
        if m:
            scale_groups.setdefault(m.group(1), {})[int(m.group(2))] = \
                sd.pop(k)
    for base, lv in scale_groups.items():
        sd[base] = np.stack(
            [lv[i].reshape(()) for i in sorted(lv)], 0)

    # backbone-only (classification pretrain) checkpoints have no
    # 'backbone.' prefix — add it if the tree expects one
    flat_params = _flatten(params)
    expects_backbone = any(p[0] == '_backbone' for p in flat_params)
    has_backbone_pref = any(k.startswith('backbone.') for k in sd)
    _top = ('neck.', 'rpn_head.', 'roi_head.', 'bbox_head.',
            'mask_head.', 'query_embedding.')
    if expects_backbone and not has_backbone_pref:
        # classification-pretrain checkpoints carry bare backbone keys;
        # leave detector-part keys (if any) untouched
        sd = {k if k.startswith(_top) else f'backbone.{k}': v
              for k, v in sd.items()}

    used = set()
    missing: List[str] = []
    new_flat = {}
    flatten_hints = flatten_hints or {}

    for path, leaf in flat_params.items():
        tkey = flax_path_to_torch_key(path)
        if tkey not in sd and '.conv.' in tkey:
            # our MaskedConv2d keeps the weight on a child named
            # 'conv'; mmcv's subclasses nn.Conv2d directly (keys like
            # ga_retina_head retina_cls.weight). Only fires on a miss,
            # so real ConvModule '.conv.' keys are untouched.
            alt = tkey.replace('.conv.', '.')
            if alt in sd:
                tkey = alt
        if tkey not in sd:
            # YOLACTProtonet: our param layers are conv{i}/deconv{i}
            # keyed by entry index; the reference wraps each entry in
            # nn.Sequential with a ReLU after it (yolact_head.py:646),
            # so the torch key index is 2*i under 'protonet.'
            m = re.match(r'^(.*mask_head\.)(?:de)?conv(\d+)\.(.*)$', tkey)
            if m:
                alt = f'{m.group(1)}protonet.{2 * int(m.group(2))}.' \
                      f'{m.group(3)}'
                if alt in sd:
                    tkey = alt
            # MaskPointHead wraps each fc in a Conv1d ConvModule
            # (mask_point_head.py:63): fcs.N.weight → fcs.N.conv.weight
            m = re.match(r'^(.*point_head\.fcs\.\d+)\.(weight|bias)$',
                         tkey)
            if m:
                alt = f'{m.group(1)}.conv.{m.group(2)}'
                if alt in sd:
                    tkey = alt
        if tkey not in sd:
            missing.append(tkey)
            new_flat[path] = leaf
            continue
        src = sd[tkey]
        # fp16/bf16 checkpoints widen to fp32; fp64 stays fp64 so the
        # optimizer-trajectory parity harness can map exact torch grads
        src = src if src.dtype == np.float64 else src.astype(np.float32)
        used.add(tkey)
        tgt_shape = tuple(leaf.shape)
        name = path[-1]
        try:
            if name == 'kernel' and src.ndim == 4 and len(tgt_shape) == 4:
                # ConvTranspose (torch (in,out,kh,kw)) vs Conv (OIHW) is
                # shape-ambiguous when in==out, so decide by module name:
                # every deconv in the surface is called 'upsample'
                # (reference fcn_mask_head.py:46 build_upsample_layer).
                is_deconv = any('upsample' in p or 'deconv' in p
                                for p in path)
                if not is_deconv and not (
                        tgt_shape[2] == src.shape[1]
                        and tgt_shape[3] == src.shape[0]):
                    # shapes only fit the deconv interpretation
                    is_deconv = (tgt_shape[2] == src.shape[0]
                                 and tgt_shape[3] == src.shape[1])
                if is_deconv:
                    # torch (in, out, kh, kw) → flax (kh, kw, in, out),
                    # spatial flip
                    src = src.transpose(2, 3, 0, 1)[::-1, ::-1]
                else:
                    # Conv: OIHW → HWIO
                    src = src.transpose(2, 3, 1, 0)
            elif name == 'weight' and src.ndim == 4 \
                    and len(tgt_shape) == 3:
                # deformable conv: torch OIHW → our (K=kh*kw, in, out)
                # tap-major row order (ops/deform_conv.py:105)
                o, i_, kh, kw = src.shape
                src = src.transpose(2, 3, 1, 0).reshape(kh * kw, i_, o)
            elif name == 'kernel' and src.ndim == 3 \
                    and src.shape[-1] == 1 and len(tgt_shape) == 2:
                # pointwise Conv1d used as an fc (MaskPointHead fcs /
                # fc_logits, mask_point_head.py): (out, in, 1) → (in, out)
                src = src[:, :, 0].T
            elif name == 'kernel' and src.ndim == 2:
                hint = flatten_hints.get('/'.join(path[:-1]))
                if hint is not None and src.shape[1] == np.prod(hint):
                    h, w, ch = hint
                    src = src.reshape(-1, ch, h, w).transpose(0, 2, 3, 1)
                    src = src.reshape(src.shape[0], -1)
                src = src.T
            elif name == 'absolute_pos_embed':
                # torch (1, C, H, W) or (1, L, C) → flax (1, H, W, C)
                if src.ndim == 4 and src.shape[1] == tgt_shape[-1]:
                    src = src.transpose(0, 2, 3, 1)
                elif src.ndim == 3:
                    _, L, c = src.shape
                    s = int(np.sqrt(L))
                    src = src.reshape(1, s, s, c)
                if src.shape != tgt_shape:
                    from .ops.interpolate import torch_bicubic_resize
                    src = torch_bicubic_resize(src, tgt_shape[1:3])
            elif name == 'relative_position_bias_table':
                if src.shape[0] != tgt_shape[0]:
                    src = _interp_bias_table(src, tgt_shape[0],
                                             src.shape[1])
            if src.shape != tgt_shape:
                raise ValueError(
                    f'shape mismatch {src.shape} vs {tgt_shape}')
            new_flat[path] = jnp.asarray(src, leaf.dtype)
        except Exception as e:
            logger.warning(f'convert failed for {tkey}: {e}')
            missing.append(tkey)
            new_flat[path] = leaf

    new_stats_flat = {}
    if batch_stats is not None:
        for path, leaf in _flatten(batch_stats).items():
            tkey = flax_path_to_torch_key(path)
            if tkey not in sd:
                missing.append(tkey)
                new_stats_flat[path] = leaf
                continue
            src = sd[tkey].astype(np.float32)
            used.add(tkey)
            if src.shape != tuple(leaf.shape):
                logger.warning(
                    f'convert failed for {tkey}: shape {src.shape} vs '
                    f'{tuple(leaf.shape)}')
                missing.append(tkey)
                new_stats_flat[path] = leaf
                continue
            new_stats_flat[path] = jnp.asarray(src, leaf.dtype)

    unexpected = [k for k in sd
                  if k not in used and 'relative_position_index' not in k
                  and 'attn_mask' not in k
                  and not k.endswith('num_batches_tracked')
                  # GFL Integral's linspace buffer (gfl_head.py:31) —
                  # a constant, rebuilt at trace time here
                  and not k.endswith('integral.project')]
    if missing:
        logger.warning(f'missing keys ({len(missing)}): {missing[:10]}...')
    if unexpected:
        logger.warning(
            f'unexpected keys ({len(unexpected)}): {unexpected[:10]}...')
    report = dict(missing=missing, unexpected=unexpected)
    if batch_stats is not None:
        return _unflatten(new_flat), _unflatten(new_stats_flat), report
    return _unflatten(new_flat), report


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    out: Dict = {}
    for path, v in flat.items():
        d = out
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = v
    return out


def default_flatten_hints(model_cfg: dict) -> Dict[str, Tuple[int, int, int]]:
    """Derive first-FC flatten hints from a detector config."""
    hints = {}
    roi = model_cfg.get('roi_head') or {}
    heads = roi.get('bbox_head')
    if heads is None:
        return hints
    heads = heads if isinstance(heads, (list, tuple)) else [heads]
    multi = len(heads) > 1
    for i, h in enumerate(heads):
        s = h.get('roi_feat_size', 7)
        nconv = h.get('num_shared_convs',
                      4 if h.get('type') == 'Shared4Conv1FCBBoxHead' else 0)
        c = (h.get('conv_out_channels', 256) if nconv
             else h.get('in_channels', 256))
        name = f'_bbox_head{i}' if multi else '_bbox_head'
        hints[f'_roi_head/{name}/shared_fcs0'] = (s, s, c)
    # CoarseMaskHead (PointRend): first fc flattens the downsampled
    # (s/d, s/d, conv_out) roi grid CHW-first in torch
    mh = roi.get('mask_head')
    if isinstance(mh, dict) and mh.get('type') == 'CoarseMaskHead':
        s = mh.get('roi_feat_size', 14) // mh.get('downsample_factor', 2)
        c = mh.get('conv_out_channels', 256)
        hints['_roi_head/_mask_head/fcs0'] = (s, s, c)
    # MaskIoUHead (Mask Scoring): stride-2 last conv halves the grid
    # before the CHW-first flatten into fcs.0 (maskiou_head.py:84)
    ih = roi.get('mask_iou_head')
    if isinstance(ih, dict):
        s = ih.get('roi_feat_size', 14) // 2
        c = ih.get('conv_out_channels', 256)
        hints['_roi_head/_mask_iou_head/fcs0'] = (s, s, c)
    return hints


# ------------------------------------------------------------------- orbax
def save_checkpoint(path: str, variables: Dict, meta: Optional[dict] = None,
                    step: int = 0):
    """Save variables (+meta) with orbax (reference analog:
    EpochBasedRunnerAmp.save_checkpoint, mmcv_custom/runner/
    epoch_based_runner.py:26-68)."""
    import orbax.checkpoint as ocp
    path = osp.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    payload = dict(variables=jax.device_get(variables),
                   meta=meta or {}, step=step)
    ckptr.save(path, payload, force=True)


def load_native_checkpoint(path: str) -> Tuple[Dict, dict]:
    """Restore inference variables from either a plain-variables
    checkpoint or a runner TrainState checkpoint (epoch_N / latest —
    params + model_state pulled out; EMA params preferred when
    present, matching the eval-hook behavior)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(osp.abspath(path))
    meta = payload.get('meta', {})
    if 'variables' in payload:
        return payload['variables'], meta
    if 'state' in payload:
        st = payload['state']
        params = st.get('ema_params') or st['params']
        variables = {'params': params, **(st.get('model_state') or {})}
        return variables, meta
    raise KeyError(
        f'unrecognized checkpoint layout at {path}: keys '
        f'{sorted(payload)}')


def load_checkpoint(module, variables, filename: str,
                    model_cfg: Optional[dict] = None,
                    logger=None) -> Tuple[Dict, dict]:
    """Load torch .pth or native orbax checkpoint into ``variables``."""
    logger = logger or get_root_logger()
    if filename.endswith(('.pth', '.pt')):
        import torch
        ckpt = torch.load(filename, map_location='cpu',
                          weights_only=False)
        state_dict = ckpt.get('state_dict', ckpt.get('model', ckpt)) \
            if isinstance(ckpt, dict) else ckpt
        meta = ckpt.get('meta', {}) if isinstance(ckpt, dict) else {}
        hints = default_flatten_hints(model_cfg or {})
        out = dict(variables)
        if 'batch_stats' in variables:
            new_params, new_stats, report = convert_torch_state_dict(
                state_dict, variables['params'], flatten_hints=hints,
                logger=logger, batch_stats=variables['batch_stats'])
            out['batch_stats'] = new_stats
        else:
            new_params, report = convert_torch_state_dict(
                state_dict, variables['params'], flatten_hints=hints,
                logger=logger)
        out['params'] = new_params
        return out, meta
    variables_new, meta = load_native_checkpoint(filename)
    return variables_new, meta


_ASYNC_CKPTR = None


def save_train_state(path: str, state, meta: Optional[dict] = None,
                     async_save: bool = False):
    """Save a full TrainState (params + opt state + model_state) with
    orbax — the preemption-safe resume path (SURVEY.md §5.4).

    The state is serialised via flax to a pure nested dict so custom
    pytree nodes (flax.struct dataclasses, optax states) restore
    structure-faithfully regardless of orbax's dict ordering.

    ``async_save`` writes in a background thread (orbax
    AsyncCheckpointer) so training resumes immediately; the previous
    in-flight save is waited on first (at most one outstanding)."""
    import orbax.checkpoint as ocp
    from flax import serialization
    payload = dict(
        state=jax.device_get(serialization.to_state_dict(state)),
        meta=meta or {})
    if async_save:
        global _ASYNC_CKPTR
        if _ASYNC_CKPTR is None:
            _ASYNC_CKPTR = ocp.AsyncCheckpointer(
                ocp.PyTreeCheckpointHandler())
        _ASYNC_CKPTR.wait_until_finished()
        _ASYNC_CKPTR.save(osp.abspath(path), payload, force=True)
        return
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(osp.abspath(path), payload, force=True)


def wait_for_async_saves():
    """Block until any in-flight async checkpoint completes (call at
    end of training)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_train_state(path: str, state_template):
    """Restore a TrainState saved by save_train_state; the template
    provides structure/dtypes."""
    import orbax.checkpoint as ocp
    from flax import serialization
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(osp.abspath(path))
    meta = payload.get('meta', {})
    state = serialization.from_state_dict(state_template,
                                          payload['state'])
    return state, meta
