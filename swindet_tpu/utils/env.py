"""Environment fingerprint logged at train start
(reference: mmdet/utils/collect_env.py, tools/train.py:138-143)."""
from __future__ import annotations

import platform
import sys
from collections import OrderedDict


def collect_env() -> 'OrderedDict[str, str]':
    env = OrderedDict()
    env['sys.platform'] = sys.platform
    env['Python'] = sys.version.replace('\n', '')
    env['Machine'] = platform.machine()
    try:
        import jax
        env['JAX'] = jax.__version__
        env['jaxlib'] = getattr(__import__('jaxlib'), '__version__', 'n/a')
        env['Devices'] = ', '.join(str(d) for d in jax.devices())
        env['Backend'] = jax.default_backend()
        env['Process count'] = str(jax.process_count())
    except Exception as e:  # pragma: no cover
        env['JAX'] = f'unavailable ({e})'
    try:
        import flax
        env['flax'] = flax.__version__
    except Exception:
        pass
    try:
        import numpy
        env['numpy'] = numpy.__version__
    except Exception:
        pass
    from ..version import __version__
    env['swindet_tpu'] = __version__
    return env
