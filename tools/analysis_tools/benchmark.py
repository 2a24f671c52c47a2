"""Inference FPS benchmark (reference:
tools/analysis_tools/benchmark.py — 2000-iter synced inference FPS;
the sync here is jax.block_until_ready)."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), *(['..'] * ('analysis_tools' in _osp.dirname(_osp.abspath(__file__)) and 2 or 1))))
import argparse
import time

import numpy as np

from swindet_tpu.apis.inference import init_detector, preprocess_images
from swindet_tpu.utils import Config


def parse_args():
    p = argparse.ArgumentParser(description='Benchmark inference FPS')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--max-iter', type=int, default=2000)
    p.add_argument('--log-interval', type=int, default=50)
    p.add_argument('--warmup', type=int, default=5)
    p.add_argument('--canvas', type=int, nargs=2, default=None,
                   help='H W static canvas (default: config test scale)')
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    args = parse_args()
    handle = init_detector(args.config, args.checkpoint)
    if args.canvas:
        h, w = args.canvas
    else:
        scale = dict(dict(handle.cfg.data.test)['pipeline'][1])[
            'img_scale']
        short, long_ = min(scale), max(scale)
        h = (short + 31) // 32 * 32
        w = (long_ + 31) // 32 * 32
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    img_shapes = jnp.asarray([[h, w]], jnp.int32)
    scale_factors = jnp.ones((1, 4), jnp.float32)
    run = handle.jitted_simple_test()

    out = run(handle.variables, img, img_shapes, scale_factors)
    jax.block_until_ready(out)
    for _ in range(args.warmup):
        out = run(handle.variables, img, img_shapes, scale_factors)
    jax.block_until_ready(out)

    num = 0
    t0 = time.perf_counter()
    for i in range(args.max_iter):
        out = run(handle.variables, img, img_shapes, scale_factors)
        num += 1
        if (i + 1) % args.log_interval == 0:
            jax.block_until_ready(out)
            fps = num / (time.perf_counter() - t0)
            print(f'[{i + 1}/{args.max_iter}] fps: {fps:.1f} img/s')
    jax.block_until_ready(out)
    fps = num / (time.perf_counter() - t0)
    print(f'Overall fps: {fps:.1f} img/s @ canvas {h}x{w}')


if __name__ == '__main__':
    main()
