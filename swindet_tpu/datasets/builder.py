"""Dataset + loader construction (reference: mmdet/datasets/builder.py:53,76;
samplers/group_sampler.py:10,51).

TPU-native loader design: host worker threads run the numpy pipeline; the
batcher draws within one aspect-ratio group (like the reference's
GroupSampler) and pads every batch onto ONE static canvas per group
(landscape/portrait), so a whole mstrain run compiles exactly two train
programs — no DataContainer/collate/scatter machinery, no retrace storms
(SURVEY.md §7 hard part 3).
"""
from __future__ import annotations

import queue
import threading
from functools import partial
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..registries import DATASETS
from ..utils.registry import build_from_cfg


def build_dataset(cfg, default_args=None):
    from .dataset_wrappers import (ClassBalancedDataset, ConcatDataset,
                                   RepeatDataset)
    if isinstance(cfg, (list, tuple)):
        return ConcatDataset([build_dataset(c, default_args) for c in cfg])
    if cfg['type'] == 'RepeatDataset':
        return RepeatDataset(build_dataset(cfg['dataset'], default_args),
                             cfg['times'])
    if cfg['type'] == 'ClassBalancedDataset':
        return ClassBalancedDataset(
            build_dataset(cfg['dataset'], default_args),
            cfg['oversample_thr'])
    if cfg['type'] == 'ConcatDataset':
        from .dataset_wrappers import ConcatDataset as CD
        return CD([build_dataset(c, default_args)
                   for c in cfg['datasets']])
    return build_from_cfg(cfg, DATASETS, default_args)


# ------------------------------------------------------------------ sampling
class GroupBatchSampler:
    """Epoch-deterministic batches drawn within one aspect-ratio group
    (reference: GroupSampler/DistributedGroupSampler — flag 0: w<h,
    1: w>=h; dist sharding via (num_replicas, rank))."""

    def __init__(self, flags: np.ndarray, batch_size: int,
                 num_replicas: int = 1, rank: int = 0, seed: int = 0,
                 shuffle: bool = True):
        self.flags = np.asarray(flags)
        self.batch_size = batch_size
        self.num_replicas = num_replicas
        self.rank = rank
        self.seed = seed
        self.shuffle = shuffle
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[List[int]]:
        rng = np.random.RandomState(self.seed + self.epoch)
        batches = []
        for g in np.unique(self.flags):
            idxs = np.where(self.flags == g)[0]
            if self.shuffle:
                idxs = idxs[rng.permutation(len(idxs))]
            # round up to full batches by wrapping (reference pads with
            # extra samples so every rank sees same #batches)
            gb = self.batch_size * self.num_replicas
            pad = (-len(idxs)) % gb
            if pad and self.shuffle:
                idxs = np.concatenate([idxs, idxs[:pad]])
            elif pad:
                idxs = idxs[:len(idxs) - len(idxs) % gb] \
                    if len(idxs) >= gb else idxs
            for i in range(0, len(idxs) - gb + 1, gb):
                chunk = idxs[i:i + gb]
                mine = chunk[self.rank * self.batch_size:
                             (self.rank + 1) * self.batch_size]
                batches.append(mine.tolist())
        if self.shuffle:
            order = rng.permutation(len(batches))
            batches = [batches[i] for i in order]
        return iter(batches)

    def __len__(self):
        n = 0
        for g in np.unique(self.flags):
            cnt = int((self.flags == g).sum())
            gb = self.batch_size * self.num_replicas
            n += (cnt + gb - 1) // gb if self.shuffle else cnt // gb
        return n


# ------------------------------------------------------------------ batching
def _round_up(v: int, d: int) -> int:
    return (v + d - 1) // d * d


_CANVAS_NEUTRAL = {
    'LoadImageFromFile', 'LoadAnnotations', 'LoadProposals',
    'LoadPanopticAnnotations', 'RandomFlip', 'Normalize',
    'PhotoMetricDistortion', 'CutOut', 'Corrupt', 'SegRescale',
    'DefaultFormatBundle', 'ImageToTensor', 'ToTensor', 'Collect',
    'FilterAnnotations', 'InstaBoost',
}


def derive_canvas(pipeline,
                  default: Tuple[int, int] = (1344, 832),
                  divisor_default: int = 32) -> Tuple[int, int]:
    """Derive the static train canvas (long, short) from a pipeline cfg.

    The loader pads every batch onto ONE static canvas so a run compiles
    two train programs; defaulting that canvas to COCO's 1344x832 is
    catastrophic for small-resolution configs — a 64x64 image on a
    1344x832 canvas is 99.6% zero padding, and LayerNorm over the
    constant pad tokens back-propagates 1/sqrt(0+eps) ~ 300x per norm,
    exploding gradients (found by the /verify smoke run, round 4).

    Walks the declared geometric transforms in order, tracking an
    output-size bound; any transform it cannot bound falls back to
    ``default``. Returns (long, short) rounded up to the Pad divisor.
    """
    divisor = divisor_default
    bound = None      # (long, short) upper bound, or None = unknown

    def scale_bound(p):
        scales = p.get('img_scale')
        if scales is None:
            return None
        if isinstance(scales, (tuple, list)) and scales and \
                not isinstance(scales[0], (tuple, list)):
            scales = [tuple(scales)]
        lo = max(max(s) for s in scales)
        sh = max(min(s) for s in scales)
        rr = p.get('ratio_range')
        if rr:
            lo = int(np.ceil(lo * max(rr)))
            sh = int(np.ceil(sh * max(rr)))
        return (lo, sh)

    def walk(steps, bound):
        nonlocal divisor
        for p in steps:
            t = p.get('type')
            if t in _CANVAS_NEUTRAL:
                continue
            if t == 'Resize':
                b = scale_bound(p)
                if b is None:
                    return None     # Resize driven by runtime scales
                bound = b
            elif t == 'RandomCrop':
                cs = p.get('crop_size')
                if cs is None:
                    return None
                b = (max(cs), min(cs))
                bound = b if bound is None else (min(bound[0], b[0]),
                                                 min(bound[1], b[1]))
            elif t == 'RandomCenterCropPad':
                cs = p.get('crop_size')
                if cs is None:
                    return None
                bound = (max(cs), min(cs))
            elif t == 'Pad':
                if p.get('size') is not None:
                    s = p['size']
                    b = (max(s), min(s))
                    bound = b if bound is None else (
                        max(bound[0], b[0]), max(bound[1], b[1]))
                if p.get('size_divisor'):
                    divisor = max(divisor, int(p['size_divisor']))
            elif t == 'AutoAugment':
                bs = [walk(branch, bound)
                      for branch in p.get('policies', [])]
                if any(b is None for b in bs) or not bs:
                    return None
                bound = (max(b[0] for b in bs), max(b[1] for b in bs))
            elif t == 'Expand':
                # expands by up to max(ratio_range); bounded only if a
                # later Resize re-bounds, so mark unknown for now
                bound = None
            elif t in ('MinIoURandomCrop',):
                pass  # shrinks (or keeps) the current bound
            else:
                return None        # unknown transform — cannot bound
        return bound

    bound = walk(pipeline or [], None)
    if bound is None:
        bound = default
    return (_round_up(int(bound[0]), divisor),
            _round_up(int(bound[1]), divisor))


def collate_detection(samples: List[dict],
                      canvas: Optional[Tuple[int, int]] = None,
                      max_gts: int = 100,
                      divisor: int = 32,
                      with_mask: bool = True,
                      mask_stride: int = 1) -> Dict[str, np.ndarray]:
    """Pad pipeline outputs onto one static canvas → train batch dict
    (img, img_shapes, pad_shapes, gt_bboxes, gt_valid, gt_labels
    [, gt_masks]). Replaces DataContainer/collate (SURVEY.md §2.9)."""
    b = len(samples)
    if canvas is None:
        ch = _round_up(max(s['img'].shape[0] for s in samples), divisor)
        cw = _round_up(max(s['img'].shape[1] for s in samples), divisor)
    else:
        ch, cw = canvas
        # AutoAugment's crop branch can flip a sample's orientation
        # (a tall crop from a landscape image resized keep-ratio), so
        # the aspect-group canvas may not fit. Fall back to the square
        # max(ch, cw) canvas for that batch — one extra static shape,
        # only compiled when such a batch actually occurs.
        mh = max(s['img'].shape[0] for s in samples)
        mw = max(s['img'].shape[1] for s in samples)
        if mh > ch or mw > cw:
            ch = cw = max(ch, cw)
    img = np.zeros((b, ch, cw, 3), np.float32)
    img_shapes = np.zeros((b, 2), np.int32)
    pad_shapes = np.zeros((b, 2), np.int32)
    gt_bboxes = np.zeros((b, max_gts, 4), np.float32)
    gt_valid = np.zeros((b, max_gts), bool)
    gt_labels = np.zeros((b, max_gts), np.int32)
    if with_mask:
        mh, mw = ch // mask_stride, cw // mask_stride
        gt_masks = np.zeros((b, max_gts, mh, mw), np.uint8)
    metas = []
    for i, s in enumerate(samples):
        h, w = s['img'].shape[:2]
        img[i, :h, :w] = s['img']
        img_shapes[i] = s['img_metas'].get('img_shape', (h, w))[:2]
        pad_shapes[i] = (h, w)
        n = min(len(s.get('gt_bboxes', ())), max_gts)
        if n:
            gt_bboxes[i, :n] = s['gt_bboxes'][:n]
            gt_valid[i, :n] = True
            gt_labels[i, :n] = s['gt_labels'][:n]
            if with_mask and 'gt_masks' in s:
                m = s['gt_masks'][:n]
                if mask_stride > 1:
                    m = m[:, ::mask_stride, ::mask_stride]
                gt_masks[i, :n, :m.shape[1], :m.shape[2]] = m
        metas.append(s['img_metas'])
    batch = dict(img=img, img_shapes=img_shapes, pad_shapes=pad_shapes,
                 gt_bboxes=gt_bboxes, gt_valid=gt_valid,
                 gt_labels=gt_labels)
    if with_mask:
        batch['gt_masks'] = gt_masks
    # semantic seg maps (HTC): per-sample scale inferred from the first
    # sample; padded with the 255 ignore label
    if any('gt_semantic_seg' in s for s in samples):
        s0 = next(s for s in samples if 'gt_semantic_seg' in s)
        seg_stride = max(
            round(samples[0]['img'].shape[0]
                  / s0['gt_semantic_seg'].shape[0]), 1)
        sh, sw = ch // seg_stride, cw // seg_stride
        seg = np.full((b, sh, sw), 255, np.uint8)
        for i, s in enumerate(samples):
            if 'gt_semantic_seg' in s:
                g = s['gt_semantic_seg']
                seg[i, :g.shape[0], :g.shape[1]] = \
                    g[:sh, :sw]
        batch['gt_semantic_seg'] = seg
    batch['img_metas'] = metas
    return batch


class NativeTrainPlan:
    """Parameters for the C++ train-batch fast path (VERDICT r4 ask #7).

    Extracted by :func:`derive_native_train_plan` from the canonical
    mstrain pipeline (LoadImageFromFile / LoadAnnotations / Resize
    keep-ratio value|range / RandomFlip / Normalize / Pad / bundle /
    Collect). The host samples each image's scale branch + flip coin
    and transforms annotations in numpy; the native thread pool does
    decode + rescale + flip + normalize + pad GIL-free
    (native/image_ops.cpp image_load_batch_train).
    """

    def __init__(self, scales, multiscale_mode, flip_ratio, mean, std,
                 to_rgb, with_mask, seed=0, pad_divisor=32,
                 autoaug_branches=None):
        self.scales = [tuple(s) for s in scales]
        self.pad_divisor = int(pad_divisor)
        # AutoAugment two-branch form (flagship Swin recipe): a list of
        # branch descriptors; None → plain single-Resize recipe
        self.autoaug_branches = autoaug_branches
        self.multiscale_mode = multiscale_mode
        self.flip_ratio = float(flip_ratio or 0.0)
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = bool(to_rgb)
        self.with_mask = bool(with_mask)
        self.seed = int(seed)

    def sample_scales(self, rng, n):
        longs = np.asarray([max(s) for s in self.scales])
        shorts = np.asarray([min(s) for s in self.scales])
        if len(self.scales) == 1:
            le = np.full(n, longs[0])
            se = np.full(n, shorts[0])
        elif self.multiscale_mode == 'value':
            pick = rng.randint(len(self.scales), size=n)
            le, se = longs[pick], shorts[pick]
        else:  # 'range' — uniform over the edge intervals
            le = rng.randint(longs.min(), longs.max() + 1, size=n)
            se = rng.randint(shorts.min(), shorts.max() + 1, size=n)
        flips = rng.rand(n) < self.flip_ratio
        return le.astype(np.int64), se.astype(np.int64), flips


def _describe_resize(t):
    """Validate a pipeline Resize for the native path; return a branch
    descriptor dict or None."""
    if (type(t).__name__ != 'Resize' or not t.keep_ratio
            or t.ratio_range is not None or t.img_scale is None
            or t.interpolation != 'bilinear' or not t.bbox_clip_border):
        return None
    if len(t.img_scale) > 1 and t.multiscale_mode not in ('value',
                                                          'range'):
        return None
    return dict(kind='resize', scales=[tuple(s) for s in t.img_scale],
                mode=t.multiscale_mode)


def _describe_autoaug_branch(tfs):
    """One AutoAugment policy → descriptor. Supported forms (the Swin
    flagship recipe, reference configs/swin/*mstrain*.py:28-57):
      [Resize]                       (plain multiscale pick)
      [Resize, RandomCrop, Resize]   (resize → crop → override-resize)
    """
    names = [type(t).__name__ for t in tfs]
    if names == ['Resize']:
        return _describe_resize(tfs[0])
    if names == ['Resize', 'RandomCrop', 'Resize']:
        r1 = _describe_resize(tfs[0])
        r2 = _describe_resize(tfs[2])
        crop = tfs[1]
        if r1 is None or r2 is None or not tfs[2].override:
            return None
        if crop.crop_type not in ('absolute', 'absolute_range'):
            return None
        # a negative crop would need the reference's retry-another-index
        # behavior, which a static batch plan cannot express
        if not (crop.allow_negative_crop and crop.bbox_clip_border):
            return None
        return dict(kind='rcr', resize1=r1, resize2=r2,
                    crop_type=crop.crop_type,
                    crop_size=tuple(crop.crop_size))
    return None


def derive_native_train_plan(dataset, seed: int = 0):
    """Return a NativeTrainPlan when the dataset's pipeline matches the
    canonical mstrain recipe — plain Resize OR the flagship AutoAugment
    two-branch form — and the native image library is built;
    None → the Python/cv2 per-sample pipeline is used."""
    from ..native import image_available
    if not image_available():
        return None
    tfs = getattr(getattr(dataset, 'pipeline', None), 'transforms',
                  None)
    if tfs is None or not hasattr(dataset, 'get_ann_info') \
            or not hasattr(dataset, 'data_infos'):
        return None
    names = [type(t).__name__ for t in tfs]
    want = ['LoadImageFromFile', 'LoadAnnotations', 'Resize',
            'RandomFlip', 'Normalize', 'Pad', 'DefaultFormatBundle',
            'Collect']
    want_aug = ['LoadImageFromFile', 'LoadAnnotations', 'AutoAugment',
                'RandomFlip', 'Normalize', 'Pad', 'DefaultFormatBundle',
                'Collect']
    branches = None
    if names == want:
        resize = tfs[2]
        desc = _describe_resize(resize)
        if desc is None:
            return None
        scales, mode = desc['scales'], desc['mode']
    elif names == want_aug:
        branches = [_describe_autoaug_branch(
            getattr(p, 'transforms', [])) for p in tfs[2].policies]
        if not branches or any(b is None for b in branches):
            return None
        # plan-level scales: union bound (used only for canvas checks)
        scales = [s for b in branches
                  for s in (b['scales'] if b['kind'] == 'resize'
                            else b['resize2']['scales'])]
        mode = 'value'
    else:
        return None
    load_ann, flip, norm, pad = tfs[1], tfs[3], tfs[4], tfs[5]
    if flip.direction != 'horizontal':
        return None
    if getattr(pad, 'size', None) is not None:
        return None
    return NativeTrainPlan(
        scales=scales, multiscale_mode=mode,
        flip_ratio=flip.flip_ratio, mean=norm.mean, std=norm.std,
        to_rgb=norm.to_rgb, with_mask=load_ann.with_mask, seed=seed,
        pad_divisor=getattr(pad, 'size_divisor', None) or 32,
        autoaug_branches=branches)


class DetDataLoader:
    """Threaded prefetching loader yielding static-shape numpy batches.

    Group-aware: every batch comes from one aspect-ratio group and is
    padded to that group's fixed canvas (landscape (max_short, max_long),
    portrait transposed), keeping jit programs to 2.

    With a ``native_plan`` the canonical mstrain pipeline runs through
    the C++ batch loader instead of the per-sample Python/cv2 pipeline.
    """

    def __init__(self, dataset, batch_size: int,
                 canvas_long: int = 1344, canvas_short: int = 832,
                 max_gts: int = 100, with_mask: bool = True,
                 num_replicas: int = 1, rank: int = 0, seed: int = 0,
                 shuffle: bool = True, num_workers: int = 4,
                 prefetch: int = 4, native_plan=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.canvas_long = canvas_long
        self.canvas_short = canvas_short
        self.max_gts = max_gts
        self.with_mask = with_mask
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.native_plan = native_plan
        self._epoch = 0
        flags = getattr(dataset, 'flag',
                        np.zeros(len(dataset), np.uint8))
        self.sampler = GroupBatchSampler(flags, batch_size, num_replicas,
                                         rank, seed, shuffle)
        self.flags = flags

    def __len__(self):
        return len(self.sampler)

    def set_epoch(self, epoch: int):
        self._epoch = epoch
        self.sampler.set_epoch(epoch)

    def _canvas_for(self, idx: int) -> Tuple[int, int]:
        if self.flags[idx] == 1:  # landscape w>=h
            return self.canvas_short, self.canvas_long
        return self.canvas_long, self.canvas_short

    def _load_batch(self, indices: List[int]) -> Dict[str, np.ndarray]:
        if self.native_plan is not None:
            return self._load_batch_native(indices)
        samples = [self.dataset[i] for i in indices]
        return collate_detection(samples,
                                 canvas=self._canvas_for(indices[0]),
                                 max_gts=self.max_gts,
                                 with_mask=self.with_mask)

    def _load_batch_native(self, indices: List[int]
                           ) -> Dict[str, np.ndarray]:
        """mstrain batch through the C++ loader: sample each image's
        scale branch/flip (and AutoAugment branch + crop when the plan
        carries the flagship two-branch recipe), native pixel work,
        numpy annotation transforms mirroring
        Resize[/RandomCrop/Resize-override]/RandomFlip exactly."""
        import os.path as osp
        from ..native import (image_decode, image_load_batch_train,
                              image_resize)
        from ..core.masks import poly2mask, rle_to_mask
        from .pipelines.transforms import _imresize, rescale_size
        plan = self.native_plan
        ds = self.dataset
        n = len(indices)
        ch, cw = self._canvas_for(indices[0])
        rng = np.random.RandomState(
            (plan.seed + 1000003 * self._epoch + 7919 * indices[0])
            % (2 ** 31))
        branches = plan.autoaug_branches or [dict(
            kind='resize', scales=plan.scales,
            mode=plan.multiscale_mode)]

        def pick_scale(desc):
            scales = desc['scales']
            if len(scales) == 1:
                return scales[0]
            if desc['mode'] == 'value':
                return scales[rng.randint(len(scales))]
            longs = [max(s) for s in scales]
            shorts = [min(s) for s in scales]
            return (rng.randint(min(longs), max(longs) + 1),
                    rng.randint(min(shorts), max(shorts) + 1))

        # ---- draw all per-sample randomness up-front (crop geometry
        # only needs the declared image dims, so no decode here)
        recipes = []
        for i in indices:
            info = ds.data_infos[i]
            h0, w0 = info['height'], info['width']
            br = branches[rng.randint(len(branches))] \
                if len(branches) > 1 else branches[0]
            if br['kind'] == 'resize':
                scale = pick_scale(br)
                ow_, oh_ = rescale_size((w0, h0), scale)
                recipes.append(dict(kind='resize', scale=scale,
                                    out_hw=(oh_, ow_)))
                continue
            s1 = pick_scale(br['resize1'])
            nw1, nh1 = rescale_size((w0, h0), s1)
            cs = br['crop_size']
            if br['crop_type'] == 'absolute':
                ch_, cw_ = min(cs[0], nh1), min(cs[1], nw1)
            else:  # absolute_range: both dims sampled in [cs0, cs1]
                ch_ = rng.randint(min(cs[0], nh1), min(cs[1], nh1) + 1)
                cw_ = rng.randint(min(cs[0], nw1), min(cs[1], nw1) + 1)
            off_h = rng.randint(0, max(nh1 - ch_, 0) + 1)
            off_w = rng.randint(0, max(nw1 - cw_, 0) + 1)
            s2 = pick_scale(br['resize2'])
            nw2, nh2 = rescale_size((cw_, ch_), s2)
            recipes.append(dict(kind='rcr', nh1=nh1, nw1=nw1,
                                crop=(off_h, off_w, ch_, cw_),
                                s2=s2, out_hw=(nh2, nw2)))
        flips = rng.rand(n) < plan.flip_ratio
        # orientation flips (tall crop from a landscape image) may not
        # fit the aspect-group canvas — square fallback, same rule as
        # collate_detection
        if any(r['out_hw'][0] > ch or r['out_hw'][1] > cw
               for r in recipes):
            ch = cw = max(ch, cw)
        paths = [osp.join(ds.img_prefix,
                          ds.data_infos[i]['file_name'])
                 for i in indices]

        # ---- pixel work: plain-resize samples first so the C++ pool
        # writes straight into a contiguous slice of the batch buffer;
        # crop-branch samples go sample-wise through the native decode
        # + u8 resize primitives
        order = [bi for bi in range(n)
                 if recipes[bi]['kind'] == 'resize'] + \
                [bi for bi in range(n) if recipes[bi]['kind'] == 'rcr']
        k = sum(1 for r in recipes if r['kind'] == 'resize')
        imgs = np.zeros((n, ch, cw, 3), np.float32)
        shapes = np.zeros((n, 2), np.int64)
        wh_scales = np.zeros((n, 2), np.float32)
        if k:
            le = np.asarray([max(recipes[bi]['scale'])
                             for bi in order[:k]], np.int64)
            se = np.asarray([min(recipes[bi]['scale'])
                             for bi in order[:k]], np.int64)
            fl = np.asarray([flips[bi] for bi in order[:k]], bool)
            _, sub_shapes, sub_scales = image_load_batch_train(
                [paths[bi] for bi in order[:k]], (ch, cw), le, se, fl,
                plan.mean, plan.std, plan.to_rgb, threads=2,
                out=imgs[:k])
            shapes[:k] = sub_shapes
            wh_scales[:k] = sub_scales
        for pos in range(k, n):
            bi = order[pos]
            rec = recipes[bi]
            img = image_decode(paths[bi])            # u8 BGR
            img = image_resize(img, rec['nh1'], rec['nw1'])
            off_h, off_w, ch_, cw_ = rec['crop']
            img = img[off_h:off_h + ch_, off_w:off_w + cw_]
            h2, w2 = img.shape[:2]
            nw2, nh2 = rescale_size((w2, h2), rec['s2'])
            rec['ws2'], rec['hs2'] = nw2 / w2, nh2 / h2
            rec['shape2'] = (nh2, nw2)
            img = image_resize(img, nh2, nw2)
            if flips[bi]:
                img = img[:, ::-1]
            f = img[..., ::-1].astype(np.float32) if plan.to_rgb \
                else img.astype(np.float32)
            imgs[pos, :nh2, :nw2] = (f - plan.mean) / plan.std
            shapes[pos] = (nh2, nw2)
            wh_scales[pos] = (rec['ws2'], rec['hs2'])

        m = self.max_gts
        gt_bboxes = np.zeros((n, m, 4), np.float32)
        gt_valid = np.zeros((n, m), bool)
        gt_labels = np.zeros((n, m), np.int32)
        masks_out = (np.zeros((n, m, ch, cw), np.uint8)
                     if (self.with_mask and plan.with_mask) else None)
        # per-sample divisor-rounded pad shapes — match the Python
        # collate path / reference valid_flags semantics, NOT the full
        # static canvas (advisor r4 high)
        div = getattr(plan, 'pad_divisor', 32)
        pad_shapes = np.zeros((n, 2), np.int32)
        metas = []
        for pos in range(n):
            bi = order[pos]
            i = indices[bi]
            rec = recipes[bi]
            ann = ds.get_ann_info(i)
            info = ds.data_infos[i]
            ih, iw = info['height'], info['width']
            oh, ow = int(shapes[pos, 0]), int(shapes[pos, 1])
            ws, hs = float(wh_scales[pos, 0]), float(wh_scales[pos, 1])
            boxes = ann['bboxes'].astype(np.float32)
            labels = np.asarray(ann['labels'])
            raw_masks = ann['masks'] if (masks_out is not None) else None

            def rasterize(j):
                mk = raw_masks[j]
                if isinstance(mk, list):
                    return poly2mask(mk, ih, iw)
                if isinstance(mk, dict):
                    return rle_to_mask(mk)
                return np.asarray(mk, bool)

            if rec['kind'] == 'resize':
                g = min(len(boxes), m)
                b = boxes[:g] * np.array([ws, hs, ws, hs], np.float32)
                b[:, 0::2] = np.clip(b[:, 0::2], 0, ow)
                b[:, 1::2] = np.clip(b[:, 1::2], 0, oh)
                if flips[bi]:
                    b[:, [0, 2]] = ow - b[:, [2, 0]]
                lbl = labels[:g]
                if masks_out is not None:
                    for j in range(g):
                        bm = _imresize(rasterize(j).astype(np.uint8),
                                       (ow, oh), 'nearest')
                        if flips[bi]:
                            bm = bm[:, ::-1]
                        masks_out[pos, j, :oh, :ow] = bm
            else:
                # Resize -> RandomCrop -> Resize(override) -> Flip,
                # composed exactly like the Python transforms
                nh1, nw1 = rec['nh1'], rec['nw1']
                off_h, off_w, ch_, cw_ = rec['crop']
                ws1 = nw1 / iw
                hs1 = nh1 / ih
                b = boxes * np.array([ws1, hs1, ws1, hs1], np.float32)
                b[:, 0::2] = np.clip(b[:, 0::2], 0, nw1)
                b[:, 1::2] = np.clip(b[:, 1::2], 0, nh1)
                b -= np.array([off_w, off_h, off_w, off_h], np.float32)
                b[:, 0::2] = np.clip(b[:, 0::2], 0, cw_)
                b[:, 1::2] = np.clip(b[:, 1::2], 0, ch_)
                valid = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
                b = b[valid]
                lbl = labels[valid]
                keep_j = np.flatnonzero(valid)
                g = min(len(b), m)
                b = b[:g] * np.array([ws, hs, ws, hs], np.float32)
                b[:, 0::2] = np.clip(b[:, 0::2], 0, ow)
                b[:, 1::2] = np.clip(b[:, 1::2], 0, oh)
                if flips[bi]:
                    b[:, [0, 2]] = ow - b[:, [2, 0]]
                lbl = lbl[:g]
                if masks_out is not None:
                    for jj in range(g):
                        bm = _imresize(
                            rasterize(int(keep_j[jj])).astype(np.uint8),
                            (nw1, nh1), 'nearest')
                        bm = bm[off_h:off_h + ch_, off_w:off_w + cw_]
                        bm = _imresize(bm, (ow, oh), 'nearest')
                        if flips[bi]:
                            bm = bm[:, ::-1]
                        masks_out[pos, jj, :oh, :ow] = bm
            gt_bboxes[pos, :g] = b
            gt_valid[pos, :g] = True
            gt_labels[pos, :g] = lbl
            ph, pw = _round_up(oh, div), _round_up(ow, div)
            pad_shapes[pos] = (ph, pw)
            metas.append(dict(
                img_shape=(oh, ow, 3), pad_shape=(ph, pw, 3),
                ori_shape=(ih, iw, 3),
                scale_factor=np.array([ws, hs, ws, hs], np.float32),
                flip=bool(flips[bi]), flip_direction='horizontal',
                filename=paths[bi]))
        batch = dict(
            img=imgs,
            img_shapes=np.asarray(shapes, np.int32),
            pad_shapes=pad_shapes,
            gt_bboxes=gt_bboxes, gt_valid=gt_valid,
            gt_labels=gt_labels, img_metas=metas)
        if masks_out is not None:
            batch['gt_masks'] = masks_out
        return batch

    def __iter__(self):
        batches = list(self.sampler)
        q: 'queue.Queue' = queue.Queue(maxsize=self.prefetch)
        it = iter(batches)
        lock = threading.Lock()
        stop = threading.Event()
        # order-preserving: a ticketing scheme
        results: Dict[int, dict] = {}
        cond = threading.Condition()
        ticket = {'next_put': 0}

        def worker():
            while not stop.is_set():
                with lock:
                    try:
                        my_ticket = ticket['next_put']
                        idxs = batches[my_ticket]
                        ticket['next_put'] += 1
                    except IndexError:
                        return
                try:
                    out = self._load_batch(idxs)
                except Exception as e:  # surface in consumer
                    out = e
                with cond:
                    results[my_ticket] = out
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            for i in range(len(batches)):
                with cond:
                    while i not in results:
                        cond.wait(timeout=60)
                    out = results.pop(i)
                if isinstance(out, Exception):
                    raise out
                yield out
        finally:
            stop.set()


def build_dataloader(dataset, samples_per_gpu: int, workers_per_gpu: int,
                     num_gpus: int = 1, dist: bool = False, seed: int = 0,
                     shuffle: bool = True, **kwargs) -> DetDataLoader:
    """mmdet-compatible surface (reference: datasets/builder.py:76).
    On TPU the batch dim is global: samples_per_gpu × #devices is handled
    by the caller sharding the batch over the mesh."""
    import jax
    num_replicas, rank = 1, 0
    if dist:
        num_replicas = jax.process_count()
        rank = jax.process_index()
    return DetDataLoader(
        dataset, batch_size=samples_per_gpu * num_gpus,
        num_replicas=num_replicas, rank=rank, seed=seed, shuffle=shuffle,
        num_workers=workers_per_gpu, **kwargs)
