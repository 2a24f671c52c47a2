"""Multiclass-NMS micro-bench on hardware (VERDICT r4 ask #5): the
~3 ms/img of inference the profiler attributes to the NMS fixpoint
rounds. Measures the full multiclass_nms (RoI-head shape: 1000 boxes x
80 classes, realistic clustered score/box distribution) and the RPN
per-level nms (268k anchors -> topk 1000 -> nms) under:

  - SWINDET_NMS_TILE (128 default / 256)
  - exact vs approx topk

Run on the TPU: python .dev_scripts/bench_nms.py
"""
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import numpy as np


def clustered_candidates(n=1000, num_classes=80, n_objects=30, seed=0):
    """Box/score distribution like a real detector head output: boxes
    cluster around objects, scores decay within a cluster."""
    rs = np.random.RandomState(seed)
    cx = rs.rand(n_objects) * 1200 + 70
    cy = rs.rand(n_objects) * 700 + 50
    w = rs.rand(n_objects) * 180 + 30
    h = rs.rand(n_objects) * 180 + 30
    cls = rs.randint(0, num_classes, n_objects)
    boxes = np.zeros((n, 4), np.float32)
    scores = np.full((n, num_classes + 1), 1e-4, np.float32)
    for i in range(n):
        o = i % n_objects
        jx = rs.randn(2) * w[o] * 0.08
        jy = rs.randn(2) * h[o] * 0.08
        x1 = cx[o] - w[o] / 2 + jx[0]
        y1 = cy[o] - h[o] / 2 + jy[0]
        boxes[i] = (max(x1, 0), max(y1, 0),
                    min(x1 + w[o] + jx[1], 1344),
                    min(y1 + h[o] + jy[1], 800))
        rank = i // n_objects
        scores[i, cls[o]] = max(0.9 * (0.85 ** rank) + rs.randn() * 0.02,
                                1e-4)
    # per-box softmax-ish background
    scores[:, -1] = 0.3
    return boxes, scores


def bench(fn, sync, iters=200, warmup=20):
    out = fn()
    sync(out)
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp
    from swindet_tpu.core.nms import multiclass_nms, nms, TILE

    boxes, scores = clustered_candidates()
    jb = jnp.asarray(boxes)
    js = jnp.asarray(scores)

    cfg = dict(iou_threshold=0.5)

    @jax.jit
    def run_mc(jb, js):
        return multiclass_nms(jb, js, score_thr=0.05, nms_cfg=cfg,
                              max_per_img=100)

    def sync_mc(o):
        return float(jnp.sum(o.dets))

    ms = bench(lambda: run_mc(jb, js), sync_mc)
    r = run_mc(jb, js)
    print(json.dumps(dict(bench='multiclass_nms_1000x80',
                          tile=TILE, ms=round(ms, 3),
                          kept=int(np.sum(np.asarray(r.valid))))))

    # RPN-ish single-class: 10k proposals -> nms max_out 1000
    rs = np.random.RandomState(1)
    nb = 10000
    b2, s2 = clustered_candidates(nb, 1, n_objects=120, seed=1)
    jb2 = jnp.asarray(b2)
    js2 = jnp.asarray(s2[:, 0] + rs.rand(nb) * 1e-3)

    @jax.jit
    def run_rpn(jb2, js2):
        return nms(jb2, js2, 0.7, 1000)

    def sync_rpn(o):
        return float(jnp.sum(o.dets))

    ms2 = bench(lambda: run_rpn(jb2, js2), sync_rpn)
    r2 = run_rpn(jb2, js2)
    print(json.dumps(dict(bench='rpn_nms_10k', tile=TILE,
                          ms=round(ms2, 3),
                          kept=int(np.sum(np.asarray(r2.valid))))))


if __name__ == '__main__':
    main()
