"""mmcv.runner shim: decorators are identity, dist info is rank0/world1,
runner/hook classes are import-time placeholders."""
import functools

import torch

from ..utils import Registry
from .checkpoint import (load_checkpoint, load_state_dict, save_checkpoint,
                         weights_to_cpu, get_state_dict, _load_checkpoint)
from . import checkpoint  # noqa
from . import hooks  # noqa
from .hooks import HOOKS, Hook

RUNNERS = Registry('runner')


def get_dist_info():
    return 0, 1


def master_only(func):
    return func


def auto_fp16(apply_to=None, out_fp32=False):
    def deco(func):
        return func
    return deco


def force_fp32(apply_to=None, out_fp16=False):
    def deco(func):
        return func
    return deco


def wrap_fp16_model(model):
    pass


class OptimizerHook(Hook):
    def __init__(self, grad_clip=None):
        self.grad_clip = grad_clip


class DistSamplerSeedHook(Hook):
    pass


@RUNNERS.register_module()
class EpochBasedRunner:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError('runner shim is import-only')


class IterBasedRunner(EpochBasedRunner):
    pass


def build_runner(cfg, default_args=None):
    raise NotImplementedError('runner shim is import-only')
