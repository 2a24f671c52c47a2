"""On-device profiler trace CLI (SURVEY §5.1: the TPU equivalent of the
reference's profile_time context manager + benchmark harness,
reference: mmdet/utils/profiling.py:10, tools/analysis_tools/benchmark.py).

Captures a ``jax.profiler`` trace of the inference path (or the train
step with ``--train``) into ``--logdir``, viewable with TensorBoard or
Perfetto (``tensorboard --logdir <dir>`` → Profile tab, or upload the
``.trace.json.gz`` under plugins/profile to ui.perfetto.dev). This is
the reproducible source of PERF.md's per-op numbers.

Usage:
  python tools/analysis_tools/profile.py CONFIG [CHECKPOINT]
      [--logdir work_dirs/profile] [--iters 20] [--canvas H W]
      [--train] [--batch N] [--server PORT]
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)),
                              '..', '..'))
import argparse
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Capture a jax.profiler trace')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--logdir', default='work_dirs/profile')
    p.add_argument('--iters', type=int, default=20,
                   help='profiled iterations (after one warmup/compile)')
    p.add_argument('--canvas', type=int, nargs=2, default=None,
                   help='H W static canvas (default: config test scale)')
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--train', action='store_true',
                   help='profile the train step (fwd+bwd+opt) instead '
                        'of inference')
    p.add_argument('--server', type=int, default=None,
                   help='instead of a bounded trace, start a profiler '
                        'trace server on this port and run until ^C '
                        '(connect with TensorBoard capture)')
    return p.parse_args()


def _canvas_from_cfg(cfg, override):
    if override:
        return tuple(override)
    scale = None
    for step in dict(cfg.data.test)['pipeline']:
        step = dict(step)
        if 'img_scale' in step:
            scale = step['img_scale']
            break
        for sub in step.get('transforms', []) or []:
            if 'img_scale' in dict(sub):
                scale = dict(sub)['img_scale']
                break
    if scale is None:
        return 800, 1344
    short, long_ = min(scale), max(scale)
    return ((short + 31) // 32 * 32, (long_ + 31) // 32 * 32)


def main():
    import jax
    import jax.numpy as jnp
    from swindet_tpu.apis.inference import init_detector

    args = parse_args()
    handle = init_detector(args.config, args.checkpoint)
    h, w = _canvas_from_cfg(handle.cfg, args.canvas)
    b = args.batch

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    img_shapes = jnp.asarray([[h, w]] * b, jnp.int32)
    scale_factors = jnp.ones((b, 4), jnp.float32)

    if args.train:
        from swindet_tpu.engine import (TrainState, build_lr_schedule,
                                        build_optimizer, jit_train_step,
                                        make_train_step)
        from swindet_tpu.models import build_detector
        from swindet_tpu.parallel import make_mesh, replicate, shard_batch
        from swindet_tpu.utils import jit_init

        model = build_detector(dict(handle.cfg.model))
        g = 24
        gt = np.zeros((b, g, 4), np.float32)
        gt[:, :, 0] = rng.rand(b, g) * (w - 80)
        gt[:, :, 1] = rng.rand(b, g) * (h - 80)
        gt[:, :, 2] = gt[:, :, 0] + 16 + rng.rand(b, g) * 64
        gt[:, :, 3] = gt[:, :, 1] + 16 + rng.rand(b, g) * 64
        num_classes = dict(dict(handle.cfg.model).get(
            'roi_head', {}).get('bbox_head', {})).get('num_classes', 80)
        batch = dict(
            img=img, img_shapes=img_shapes, pad_shapes=img_shapes,
            gt_bboxes=jnp.asarray(gt),
            gt_valid=jnp.ones((b, g), bool),
            gt_labels=jnp.asarray(
                rng.randint(0, num_classes, (b, g)), jnp.int32),
            gt_masks=jnp.asarray(
                (rng.rand(b, g, h, w) > 0.5).astype(np.float32)))
        params = handle.variables.get('params') or jit_init(
            model, {'params': jax.random.PRNGKey(0),
                    'sampling': jax.random.PRNGKey(1)},
            img[:1], method='forward_dummy')['params']
        sched = build_lr_schedule(
            dict(handle.cfg.lr_config), dict(handle.cfg.optimizer)['lr'],
            iters_per_epoch=1000)
        tx = build_optimizer(params, dict(handle.cfg.optimizer), sched)
        state = TrainState.create(params, tx)
        mesh = make_mesh()
        step = jit_train_step(make_train_step(model, tx), mesh)
        state = replicate(mesh, state)
        batch = shard_batch(mesh, batch)
        key = jax.random.PRNGKey(7)

        def run():
            nonlocal state
            state, metrics = step(state, batch, key)
            return metrics
    else:
        fn = handle.jitted_simple_test()
        run = lambda: fn(handle.variables, img, img_shapes,
                         scale_factors)

    # compile outside the trace
    out = run()
    jax.block_until_ready(jax.tree.leaves(out)[0])

    if args.server is not None:
        jax.profiler.start_server(args.server)
        print(f'profiler trace server on :{args.server}; running '
              'inference loop until ^C — capture from TensorBoard')
        try:
            while True:
                out = run()
                jax.block_until_ready(jax.tree.leaves(out)[0])
        except KeyboardInterrupt:
            return

    t0 = time.perf_counter()
    with jax.profiler.trace(args.logdir):
        for _ in range(args.iters):
            out = run()
        jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = time.perf_counter() - t0
    print(f'traced {args.iters} iters in {dt:.2f}s '
          f'({args.iters * b / dt:.1f} img/s) -> {args.logdir}')
    print('view: tensorboard --logdir', args.logdir)


if __name__ == '__main__':
    main()
