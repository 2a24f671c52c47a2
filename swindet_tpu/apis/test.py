"""Evaluation loop (reference: mmdet/apis/test.py:16 single_gpu_test,
:69 multi_gpu_test).

TPU shape discipline: val images are grouped by aspect-ratio flag and
padded onto ONE canvas per group, so the whole val set runs under at
most two compiled programs. Masks leave the device as 28×28 probs; RLE
encoding + pasting happen on host (the only host step, as in
SURVEY.md §7 step 5). Multi-host: each process runs its shard of the
dataset (jax.process_index) — results are plain python lists merged by
the caller.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .inference import DetectorHandle, format_results


def _round_up(v, d=32):
    return (v + d - 1) // d * d


def _native_eval_plan(dataset):
    """Opt-in (SWINDET_NATIVE_IMAGE=1) native batched test loader: when
    the test pipeline is the canonical single-scale keep-ratio pattern
    (LoadImageFromFile → MultiScaleFlipAug[Resize keep_ratio,
    RandomFlip(off), Normalize, Pad(size_divisor)] …) the whole
    decode→rescale→normalize→pad stage runs in the C++ thread pool
    (native/image_ops.cpp image_load_batch) instead of per-image
    Python. Returns the decode plan, or None to use the Python path
    (reference counterpart: DataLoader fork workers running
    mmcv imread/imresize/imnormalize, mmdet/apis/test.py:16)."""
    import os
    if os.environ.get('SWINDET_NATIVE_IMAGE') != '1':
        return None
    from .. import native
    if not native.image_available():
        return None
    from ..datasets.pipelines import transforms as T
    tfs = getattr(getattr(dataset, 'pipeline', None), 'transforms', None)
    infos = getattr(dataset, 'data_infos', None)
    if not tfs or len(tfs) != 2 or infos is None:
        return None
    load, msfa = tfs
    if not isinstance(load, T.LoadImageFromFile) \
            or not isinstance(msfa, T.MultiScaleFlipAug):
        return None
    if msfa.flip or len(msfa.img_scale) != 1 \
            or not isinstance(msfa.img_scale[0], tuple):
        return None
    inner = msfa.transforms.transforms
    allowed = (T.Resize, T.RandomFlip, T.Normalize, T.Pad,
               T.ImageToTensor, T.DefaultFormatBundle, T.Collect)
    if any(not isinstance(t, allowed) for t in inner):
        return None
    resize = next((t for t in inner if isinstance(t, T.Resize)), None)
    norm = next((t for t in inner if isinstance(t, T.Normalize)), None)
    pad = next((t for t in inner if isinstance(t, T.Pad)), None)
    if resize is None or norm is None or pad is None:
        return None
    if not resize.keep_ratio or pad.size_divisor is None or pad.pad_val:
        return None
    if any('height' not in i or 'width' not in i for i in infos):
        return None
    scale = msfa.img_scale[0]
    prefix = getattr(dataset, 'img_prefix', '') or ''
    paths = [os.path.join(prefix, i['filename']) for i in infos]
    ori = np.array([(i['height'], i['width']) for i in infos], np.int64)
    return dict(paths=paths, long=max(scale), short=min(scale),
                mean=norm.mean, std=norm.std, to_rgb=norm.to_rgb,
                divisor=pad.size_divisor, ori=ori)


def _native_batched_test(model: DetectorHandle, dataset, plan,
                         batch_size, num_classes, mask_thr,
                         logger=None) -> List:
    """Eval loop over native-decoded batches (see _native_eval_plan)."""
    from .. import native
    n = len(dataset)
    run = model.jitted_simple_test()
    flags = getattr(dataset, 'flag', np.zeros(n, np.uint8))
    long_e, short_e, d = plan['long'], plan['short'], plan['divisor']
    results: List = [None] * n
    t0 = time.perf_counter()
    done = 0
    for g in (0, 1):
        idxs = np.nonzero(flags == g)[0]
        if idxs.size == 0:
            continue
        if g == 1:  # landscape w >= h
            ch, cw = _round_up(short_e, d), _round_up(long_e, d)
        else:
            ch, cw = _round_up(long_e, d), _round_up(short_e, d)
        for s in range(0, len(idxs), batch_size):
            chunk = idxs[s:s + batch_size]
            b = len(chunk)
            img, shapes, scales = native.image_load_batch(
                [plan['paths'][i] for i in chunk], (ch, cw),
                (long_e, short_e), plan['mean'], plan['std'],
                to_rgb=plan['to_rgb'], threads=8)
            if (shapes <= 0).any():
                bad = chunk[np.nonzero((shapes <= 0).any(1))[0][0]]
                raise FileNotFoundError(
                    f'cannot read image {plan["paths"][bad]}')
            if b < batch_size:  # keep ONE static batch shape
                padn = batch_size - b
                img = np.concatenate(
                    [img, np.zeros((padn, ch, cw, 3), np.float32)])
                shapes = np.concatenate(
                    [shapes, np.ones((padn, 2), np.int64)])
                scales = np.concatenate(
                    [scales, np.ones((padn, 2), np.float32)])
            img_shapes = shapes.astype(np.int32)
            scale_factors = np.concatenate(
                [scales, scales], -1).astype(np.float32)  # (w,h,w,h)
            metas = [dict(ori_shape=(int(plan['ori'][i][0]),
                                     int(plan['ori'][i][1]), 3),
                          img_shape=(int(shapes[j][0]),
                                     int(shapes[j][1])),
                          scale_factor=scale_factors[j])
                     for j, i in enumerate(chunk)]
            out = run(model.variables, jnp.asarray(img),
                      jnp.asarray(img_shapes), jnp.asarray(scale_factors))
            out = jax.device_get(out)
            out = {k: v[:b] for k, v in out.items()}
            batch_results = format_results(out, metas, num_classes,
                                           mask_thr)
            for j, i in enumerate(chunk):
                results[i] = batch_results[j]
            done += b
            if logger is not None and done % (batch_size * 10) < batch_size:
                dt = time.perf_counter() - t0
                logger.info(
                    f'test [{done}/{n}] {done / dt:.1f} img/s (native)')
    return results


def single_gpu_test(model: DetectorHandle, dataset,
                    batch_size: int = 8,
                    show: bool = False,
                    out_dir: Optional[str] = None,
                    logger=None) -> List:
    """Run test-pipeline inference over a test-mode dataset; returns
    reference-format per-image results (in dataset order)."""
    n = len(dataset)
    run = model.jitted_simple_test()
    num_classes = len(model.CLASSES)
    test_cfg = dict(model.cfg.model.test_cfg)
    mask_thr = dict(test_cfg['rcnn']).get('mask_thr_binary', 0.5) \
        if 'rcnn' in test_cfg else 0.5

    plan = _native_eval_plan(dataset)
    if plan is not None:
        return _native_batched_test(model, dataset, plan, batch_size,
                                    num_classes, mask_thr, logger)

    # ---- gather pipeline outputs, grouped by orientation
    groups: Dict[int, List[int]] = {0: [], 1: []}
    processed = [None] * n
    n_aug = 1
    for i in range(n):
        r = dataset[i]
        # MultiScaleFlipAug output: dict of lists (one entry per aug)
        if isinstance(r.get('img'), list):
            n_aug = max(n_aug, len(r['img']))
        processed[i] = r
        img0 = r['img'][0] if isinstance(r['img'], list) else r['img']
        h, w = img0.shape[:2]
        groups[1 if w >= h else 0].append(i)

    # TTA path: every aug consumed via merge_aug machinery (reference:
    # base.py:125 aug_test dispatch → roi test_mixins / dense-head
    # aug_test_bboxes). No silent first-aug fallback: a model without
    # an aug path raises.
    if n_aug > 1:
        from .aug_test import aug_test_single_stage, aug_test_two_stage
        if hasattr(model.module, 'aug_rpn_test'):
            aug_fn = aug_test_two_stage
        elif hasattr(model.module, 'aug_bbox_test'):
            aug_fn = aug_test_single_stage
        else:
            raise NotImplementedError(
                f'{type(model.module).__name__} has no aug_test path; '
                'drop flip/extra scales from the test pipeline')
        return _tta_test(model, processed, groups, batch_size,
                         num_classes, mask_thr, logger, aug_fn=aug_fn)
    for i in range(n):
        r = processed[i]
        if isinstance(r.get('img'), list):
            processed[i] = {k: (v[0] if isinstance(v, list) else v)
                            for k, v in r.items()}

    # ---- per-group fixed canvas
    results: List = [None] * n
    t0 = time.perf_counter()
    done = 0
    for g, idxs in groups.items():
        if not idxs:
            continue
        ch = _round_up(max(processed[i]['img'].shape[0] for i in idxs))
        cw = _round_up(max(processed[i]['img'].shape[1] for i in idxs))
        for s in range(0, len(idxs), batch_size):
            chunk = idxs[s:s + batch_size]
            b = len(chunk)
            pad_b = batch_size - b  # keep ONE static batch shape
            img = np.zeros((batch_size, ch, cw, 3), np.float32)
            img_shapes = np.ones((batch_size, 2), np.int32)
            scale_factors = np.ones((batch_size, 4), np.float32)
            metas = []
            for j, i in enumerate(chunk):
                r = processed[i]
                h, w = r['img'].shape[:2]
                img[j, :h, :w] = r['img']
                img_shapes[j] = (h, w)
                sf = r.get('img_metas', r).get('scale_factor',
                                               np.ones(4, np.float32)) \
                    if isinstance(r.get('img_metas'), dict) else \
                    r.get('scale_factor', np.ones(4, np.float32))
                scale_factors[j] = sf
                meta = r['img_metas'] if isinstance(
                    r.get('img_metas'), dict) else r
                metas.append(dict(ori_shape=meta['ori_shape'],
                                  img_shape=(h, w),
                                  scale_factor=scale_factors[j]))
            out = run(model.variables, jnp.asarray(img),
                      jnp.asarray(img_shapes), jnp.asarray(scale_factors))
            out = jax.device_get(out)
            out = {k: v[:b] for k, v in out.items()}
            batch_results = format_results(out, metas, num_classes,
                                           mask_thr)
            for j, i in enumerate(chunk):
                results[i] = batch_results[j]
            done += b
            if logger is not None and done % (batch_size * 10) < batch_size:
                dt = time.perf_counter() - t0
                logger.info(f'test [{done}/{n}] {done / dt:.1f} img/s')
    return results


def _tta_test(model: DetectorHandle, processed, groups, batch_size,
              num_classes, mask_thr, logger=None, aug_fn=None) -> List:
    """Static-shape TTA eval: one fixed canvas per (orientation group,
    aug index); every aug is merged on the aug_test path."""
    from .aug_test import aug_test_two_stage
    if aug_fn is None:
        aug_fn = aug_test_two_stage
    results: List = [None] * len(processed)
    t0 = time.perf_counter()
    done = 0
    for g, idxs in groups.items():
        if not idxs:
            continue
        n_aug = len(processed[idxs[0]]['img'])
        canvases = []
        for a in range(n_aug):
            ch = _round_up(max(processed[i]['img'][a].shape[0]
                               for i in idxs))
            cw = _round_up(max(processed[i]['img'][a].shape[1]
                               for i in idxs))
            canvases.append((ch, cw))
        for s in range(0, len(idxs), batch_size):
            chunk = idxs[s:s + batch_size]
            b = len(chunk)
            aug_batches = []
            metas = []
            for a in range(n_aug):
                ch, cw = canvases[a]
                img = np.zeros((batch_size, ch, cw, 3), np.float32)
                img_shapes = np.ones((batch_size, 2), np.int32)
                scale_factors = np.ones((batch_size, 4), np.float32)
                flip = bool(processed[chunk[0]]['flip'][a])
                flip_dir = processed[chunk[0]].get(
                    'flip_direction', ['horizontal'] * n_aug)[a] \
                    or 'horizontal'
                for j, i in enumerate(chunk):
                    r = processed[i]
                    im = r['img'][a]
                    h, w = im.shape[:2]
                    img[j, :h, :w] = im
                    img_shapes[j] = (h, w)
                    scale_factors[j] = r['scale_factor'][a]
                    if a == 0:
                        metas.append(dict(
                            ori_shape=r['ori_shape'][0],
                            img_shape=(h, w),
                            scale_factor=np.ones(4, np.float32)))
                aug_batches.append(dict(
                    img=jnp.asarray(img),
                    img_shapes=jnp.asarray(img_shapes),
                    scale_factors=jnp.asarray(scale_factors),
                    flip=flip, flip_direction=flip_dir))
            out = aug_fn(model, aug_batches)
            out = {k: v[:b] for k, v in out.items()}
            # aug_test outputs are already in the original frame
            batch_results = format_results(out, metas, num_classes,
                                           mask_thr)
            for j, i in enumerate(chunk):
                results[i] = batch_results[j]
            done += b
            if logger is not None and done % (batch_size * 10) < batch_size:
                dt = time.perf_counter() - t0
                logger.info(
                    f'tta test [{done}/{len(processed)}] '
                    f'{done / dt:.1f} img/s')
    return results


def multi_gpu_test(model: DetectorHandle, dataset, batch_size: int = 8,
                   tmpdir: Optional[str] = None,
                   gpu_collect: bool = False, logger=None) -> List:
    """Multi-host sharded eval (reference: apis/test.py:69): each
    process tests a stride-sharded subset; rank 0 gets the merged list
    via process_allgather of indices+pickles is unnecessary under the
    single-controller model — here each host simply evaluates its shard
    and results are merged in-memory when process_count == 1."""
    if jax.process_count() == 1:
        return single_gpu_test(model, dataset, batch_size, logger=logger)
    rank = jax.process_index()
    world = jax.process_count()
    my_idx = list(range(rank, len(dataset), world))

    class _Shard:
        def __len__(self):
            return len(my_idx)

        def __getitem__(self, i):
            return dataset[my_idx[i]]

    shard_results = single_gpu_test(model, _Shard(), batch_size,
                                    logger=logger)
    # gather to every host via multihost utils (padded object gather)
    from jax.experimental import multihost_utils
    arr = pack_shard_results(my_idx, shard_results)
    sizes = multihost_utils.process_allgather(
        np.asarray([arr.size], np.int64))
    padded = pad_shard_payload(arr, int(sizes.max()))
    gathered = multihost_utils.process_allgather(padded)
    return merge_gathered_results(gathered, sizes, len(dataset))


def pack_shard_results(my_idx, shard_results) -> np.ndarray:
    """Serialize one process's (dataset index, result) pairs to a uint8
    payload for the padded object allgather (pure bookkeeping half of
    multi_gpu_test; reference analog: mmdet/apis/test.py:117-190
    collect_results_cpu part pickles)."""
    import pickle
    payload = pickle.dumps(list(zip(my_idx, shard_results)))
    return np.frombuffer(payload, np.uint8)


def pad_shard_payload(arr: np.ndarray, maxlen: int) -> np.ndarray:
    """Right-pad a payload to the fleet-wide max length (allgather needs
    one static shape across processes)."""
    padded = np.zeros(maxlen, np.uint8)
    padded[:arr.size] = arr
    return padded


def merge_gathered_results(gathered, sizes, n: int) -> List:
    """Unpad + unpickle every process's payload and place each result at
    its original dataset index. ``gathered`` is (world, maxlen) uint8,
    ``sizes`` is (world, 1) true byte counts."""
    import pickle
    sizes = np.asarray(sizes).reshape(-1)
    results: List = [None] * n
    for r in range(len(sizes)):
        blob = bytes(np.asarray(gathered[r])[:int(sizes[r])])
        for i, res in pickle.loads(blob):
            results[i] = res
    return results
