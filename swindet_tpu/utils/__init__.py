from .registry import Registry, build_from_cfg
from .config import Config, ConfigDict, DictAction
from .logger import get_root_logger
from .env import collect_env

__all__ = [
    'Registry', 'build_from_cfg', 'Config', 'ConfigDict', 'DictAction',
    'get_root_logger', 'collect_env',
]

from .jit_init import jit_init  # noqa: E402
from .sanity import check_num_classes, enable_debug_nans  # noqa: E402

__all__ += ['jit_init', 'check_num_classes', 'enable_debug_nans']
