"""Device-mesh + sharding utilities (TPU-native replacement for the
reference's NCCL DDP stack: MMDistributedDataParallel at
mmdet/apis/train.py:95-99, allreduce_grads at
mmdet/core/utils/dist_utils.py:10-51, init_dist launchers).

One ``Mesh`` with a ``data`` axis replaces every torch.distributed
collective: gradients are averaged by XLA-inserted psum when the batch
is sharded and params are replicated under jit; ICI within a slice and
DCN across slices are picked automatically by device order.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data[, model]) mesh over available devices.

    With ``model_parallel == 1`` the mesh is 1-D (pure DP — the only
    parallelism the reference has, SURVEY.md §2.10); >1 adds a ``model``
    axis for tensor-parallel extensions.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    if model_parallel == 1:
        return Mesh(arr.reshape(-1), (DATA_AXIS,))
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch pytree with the leading dim sharded over
    ``data`` (replaces DataContainer scatter, mmcv parallel)."""
    sharding = data_sharded(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params/opt state) over the whole mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    assert global_batch % n == 0, \
        f'global batch {global_batch} not divisible by data axis {n}'
    return global_batch // n
