from .mesh import (DATA_AXIS, MODEL_AXIS, make_mesh, replicated,
                   data_sharded, shard_batch, replicate, local_batch_size)

__all__ = [
    'DATA_AXIS', 'MODEL_AXIS', 'make_mesh', 'replicated', 'data_sharded',
    'shard_batch', 'replicate', 'local_batch_size',
]
