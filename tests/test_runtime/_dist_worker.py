"""Worker for the 2-process jax.distributed CPU smoke (VERDICT r4 ask
#7): each process contributes one CPU device to a real multi-process
fleet (gloo collectives), runs ONE data-sharded train step of the tiny
Mask R-CNN over the global 2-device mesh, then exercises the production
eval result-collection path (pack → padded process_allgather → merge;
reference analog: mmdet/apis/test.py:117-190 collect_results_cpu).

Run: python _dist_worker.py <process_id> <port>
Prints DIST_SMOKE_OK on success; the parent test asserts both ranks do.
"""
import os
import os.path as osp
import sys

REPO = osp.abspath(osp.join(osp.dirname(__file__), '..', '..'))


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    # the env var alone is not enough where a TPU plugin (axon) is
    # registered — the config knob is what actually pins the platform
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    jax.config.update('jax_num_cpu_devices', 1)
    jax.config.update('jax_default_matmul_precision', 'highest')
    jax.distributed.initialize(
        coordinator_address=f'localhost:{port}',
        num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2, jax.devices()      # global fleet
    assert len(jax.local_devices()) == 1

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    sys.path.insert(0, REPO)
    from swindet_tpu.models import build_detector
    from swindet_tpu.engine import (TrainState, build_lr_schedule,
                                    build_optimizer, jit_train_step,
                                    make_train_step)
    from swindet_tpu.parallel import make_mesh, replicate
    from tests.test_models.test_forward import (tiny_maskrcnn_cfg,
                                                demo_inputs)

    # ---- (a) one real data-sharded train step over the global mesh
    model = build_detector(tiny_maskrcnn_cfg())
    global_batch = demo_inputs(b=2, h=64, w=64)        # deterministic
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        global_batch['img'][:1], method='forward_dummy')
    sched = build_lr_schedule(
        dict(policy='step', warmup=None, step=[1000]),
        base_lr=1e-3, iters_per_epoch=10)
    tx = build_optimizer(variables['params'],
                         dict(type='SGD', lr=1e-3), sched)
    state = TrainState.create(variables['params'], tx)
    mesh = make_mesh()                                  # 2 global devices
    assert mesh.shape['data'] == 2
    step = jit_train_step(make_train_step(model, tx), mesh)
    state = replicate(mesh, state)

    # each process feeds its LOCAL half; the global sharded array is
    # assembled across processes (single-controller-per-host SPMD)
    def to_global(x):
        local = np.asarray(x)[pid:pid + 1]
        return multihost_utils.host_local_array_to_global_array(
            local, mesh, P('data'))

    sbatch = {k: to_global(v) for k, v in global_batch.items()}
    state, metrics = step(state, sbatch, jax.random.PRNGKey(3))
    loss = float(metrics['loss'])
    assert np.isfinite(loss), loss

    # ---- (b) eval result collection: the production padded allgather
    from swindet_tpu.apis.test import (merge_gathered_results,
                                       pack_shard_results,
                                       pad_shard_payload)
    n = 5
    my_idx = list(range(pid, n, 2))
    shard_results = [('rank', pid, 'idx', i) for i in my_idx]
    arr = pack_shard_results(my_idx, shard_results)
    sizes = multihost_utils.process_allgather(
        np.asarray([arr.size], np.int64))
    padded = pad_shard_payload(arr, int(sizes.max()))
    gathered = multihost_utils.process_allgather(padded)
    merged = merge_gathered_results(gathered, sizes, n)
    assert len(merged) == n and all(r is not None for r in merged)
    for i, r in enumerate(merged):
        assert r == ('rank', i % 2, 'idx', i), (i, r)

    print(f'DIST_SMOKE_OK loss={loss:.4f}', flush=True)


if __name__ == '__main__':
    main()
