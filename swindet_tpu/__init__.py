"""swindet_tpu: TPU-native (JAX/XLA/Pallas/pjit) object-detection framework
with the capability surface of Swin-Transformer-Object-Detection
(an mmdetection v2.11 fork; reference mounted at /root/reference).

Design: functional core (pure jitted step functions over pytrees), static
shapes everywhere (padding + validity masks), config/registry shell
preserving the reference's public API surface.
"""
import os as _os

from .version import __version__, short_version

__all__ = ['__version__', 'short_version']


def _setup_compilation_cache():
    """Persistent XLA compile cache: repeat runs of the same program
    (tools/train.py restarts, bench re-runs) skip 1-10 min compiles.
    Opt out with SWINDET_NO_CACHE=1."""
    if _os.environ.get('SWINDET_NO_CACHE'):
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            cache = _os.environ.get(
                'SWINDET_CACHE_DIR',
                _os.path.join(_os.path.expanduser('~'), '.cache',
                              'swindet_tpu', 'xla'))
            _os.makedirs(cache, exist_ok=True)
            jax.config.update('jax_compilation_cache_dir', cache)
            jax.config.update('jax_persistent_cache_min_compile_time_secs',
                              1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def _honor_platform_env():
    """Re-assert JAX_PLATFORMS into jax's config: site plugins may
    rewrite the platform priority list at import (e.g. to
    'axon,cpu'), which makes JAX_PLATFORMS=cpu runs block on an
    unreachable accelerator tunnel. The user's env wins."""
    env = _os.environ.get('JAX_PLATFORMS')
    if not env:
        return
    try:
        import jax
        if jax.config.jax_platforms != env:
            jax.config.update('jax_platforms', env)
    except Exception:  # pragma: no cover - best-effort
        pass


_setup_compilation_cache()
_honor_platform_env()
