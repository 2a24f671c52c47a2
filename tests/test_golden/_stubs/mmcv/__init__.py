"""Minimal pure-python/pure-torch mmcv shim.

Purpose: make the REFERENCE mmdet source at /root/reference importable
and runnable on CPU so golden-parity tests can compare swindet_tpu
against the reference's own model code. This is NOT a copy of mmcv —
it implements the documented public semantics of the handful of ops the
reference exercises (RoIAlign aligned/adaptive-ratio, greedy NMS,
ConvModule conv→norm→act, norm/upsample builders) in plain torch.

Only ever imported by tests/test_golden via an isolated sys.path entry.
"""
__version__ = '1.3.0'

from .utils import (Registry, build_from_cfg, ConfigDict, Config,
                    print_log, get_logger, mkdir_or_exist,
                    import_modules_from_strings, collect_env,
                    get_git_hash, is_str, deprecated_api_warning,
                    is_tuple_of, is_list_of, slice_list, concat_list)
from . import utils  # noqa
from . import ops  # noqa
from . import cnn  # noqa
from . import runner  # noqa
from . import parallel  # noqa
from . import image  # noqa
from . import fileio  # noqa
from .image import (imread, imwrite, imfrombytes, bgr2rgb, rgb2bgr,
                    imrescale, imresize, imflip, impad,
                    impad_to_multiple, imnormalize, imdenormalize,
                    tensor2imgs, imshow)
from .fileio import load, dump, FileClient

import numpy as np


def concat_array(arrs):
    return np.concatenate(arrs)


def jit(func=None, **kwargs):
    """mmcv.jit is a parrots-only accelerator; identity on torch."""
    if func is not None:
        return func

    def deco(f):
        return f

    return deco
