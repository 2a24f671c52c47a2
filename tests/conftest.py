"""Test config: run everything on a virtual 8-device CPU mesh so that real
pjit/shard_map/pmean paths are exercised without TPU hardware (strictly
better than the reference's mock-the-collectives strategy, SURVEY.md §4)."""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# Persistent compilation cache: repeat test runs skip XLA compiles.
_CACHE = os.path.join(os.path.dirname(__file__), '..', '.jax_cache')
jax.config.update('jax_compilation_cache_dir', os.path.abspath(_CACHE))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
