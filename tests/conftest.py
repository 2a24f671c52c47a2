"""Test config: run everything on a virtual 8-device CPU mesh so that real
pjit/shard_map/pmean paths are exercised without TPU hardware (strictly
better than the reference's mock-the-collectives strategy, SURVEY.md §4)."""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'  # force: shell may export axon

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# 8 virtual CPU devices for real pjit/collective tests (jax>=0.9 API;
# the old --xla_force_host_platform_device_count XLA flag is ignored)
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)

# Persistent compilation cache: repeat test runs skip XLA compiles.
_CACHE = os.path.join(os.path.dirname(__file__), '..', '.jax_cache')
jax.config.update('jax_compilation_cache_dir', os.path.abspath(_CACHE))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
# CPU tests must be numerically strict: the default matmul precision on
# this platform is bf16-grade (~1e-2 error on fp32 inputs).
jax.config.update('jax_default_matmul_precision', 'highest')


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: full-scale tests excluded from quick runs '
        '(run with -m slow)')


def pytest_collection_modifyitems(config, items):
    if config.getoption('-m'):
        return
    skip = pytest.mark.skip(reason='slow: run with -m slow')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)
