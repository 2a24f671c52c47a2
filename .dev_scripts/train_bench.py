"""Train-step timing: batch-2 800x1344 real-content Mask R-CNN Swin-T
(the PERF.md train-side harness; reference counterpart: the apex-AMP
training loop economics, mmdet apis/train.py). Run on a TPU chip;
set TRACE_DIR=/tmp/trace for a jax.profiler capture."""
import os.path as osp
import sys, time
sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _tiny_swin_t_cfg
    from swindet_tpu.models import build_detector
    from swindet_tpu.engine import (TrainState, build_optimizer,
                                    jit_train_step, make_train_step)
    from swindet_tpu.parallel import make_mesh, replicate, shard_batch
    from swindet_tpu.utils import jit_init

    b, h, w, g = 2, 800, 1344, 24
    cfg = _tiny_swin_t_cfg()
    cfg['dtype'] = jnp.bfloat16
    model = build_detector(cfg)

    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (b, h, w, 3)).astype(np.float32)
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    img = jnp.asarray((raw - mean) / std, jnp.float32)
    img_shapes = jnp.asarray([[h, w]] * b, jnp.int32)
    gt = np.zeros((b, g, 4), np.float32)
    gt[:, :, 0] = rng.rand(b, g) * (w - 80)
    gt[:, :, 1] = rng.rand(b, g) * (h - 80)
    gt[:, :, 2] = gt[:, :, 0] + 16 + rng.rand(b, g) * 200
    gt[:, :, 3] = gt[:, :, 1] + 16 + rng.rand(b, g) * 200
    batch = dict(
        img=img, img_shapes=img_shapes, pad_shapes=img_shapes,
        gt_bboxes=jnp.asarray(gt),
        gt_valid=jnp.ones((b, g), bool),
        gt_labels=jnp.asarray(rng.randint(0, 80, (b, g)), jnp.int32),
        gt_masks=jnp.asarray((rng.rand(b, g, h, w) > 0.5)
                             .astype(np.float32)))
    variables = jit_init(
        model, {'params': jax.random.PRNGKey(0),
                'sampling': jax.random.PRNGKey(1)},
        img[:1, :64, :64], method='forward_dummy')
    import optax
    tx = build_optimizer(variables['params'],
                         dict(type='AdamW', lr=1e-4, weight_decay=0.05),
                         optax.constant_schedule(1e-4))
    state = TrainState.create(variables['params'], tx)
    mesh = make_mesh()
    step = jit_train_step(make_train_step(model, tx), mesh)
    state = replicate(mesh, state)
    batch = shard_batch(mesh, batch)
    key = jax.random.PRNGKey(7)

    def sync(m):
        return float(jax.tree.leaves(m)[0])

    t0 = time.time()
    state, metrics = step(state, batch, key)
    sync(metrics)
    print(f'compile+first: {time.time()-t0:.1f}s  loss={metrics}')
    for _ in range(3):
        state, metrics = step(state, batch, key)
    sync(metrics)
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, batch, key)
    sync(metrics)
    dt = (time.time() - t0) / iters
    print(f'train step: {dt*1000:.1f} ms/batch-{b} = '
          f'{b/dt:.2f} img/s/chip')

    import os
    if os.environ.get('TRACE_DIR'):
        with jax.profiler.trace(os.environ['TRACE_DIR']):
            for _ in range(5):
                state, metrics = step(state, batch, key)
            sync(metrics)
        print('trace ->', os.environ['TRACE_DIR'])


if __name__ == '__main__':
    main()
