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
    # gather to host 0 via multihost utils (padded object gather)
    from jax.experimental import multihost_utils
    import pickle
    payload = pickle.dumps(list(zip(my_idx, shard_results)))
    arr = np.frombuffer(payload, np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([arr.size], np.int64))
    maxlen = int(sizes.max())
    padded = np.zeros(maxlen, np.uint8)
    padded[:arr.size] = arr
    gathered = multihost_utils.process_allgather(padded)
    results: List = [None] * len(dataset)
    for r in range(world):
        blob = bytes(gathered[r][:int(sizes[r][0])])
        for i, res in pickle.loads(blob):
            results[i] = res
    return results
