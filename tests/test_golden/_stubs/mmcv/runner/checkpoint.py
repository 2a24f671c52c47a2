"""Checkpoint helpers (real enough for save/load of plain .pth files)."""
from collections import OrderedDict

import torch


def load_state_dict(module, state_dict, strict=False, logger=None):
    missing, unexpected = module.load_state_dict(state_dict, strict=strict)
    return missing, unexpected


def _load_checkpoint(filename, map_location=None):
    return torch.load(filename, map_location=map_location or 'cpu',
                      weights_only=False)


def load_checkpoint(model, filename, map_location='cpu', strict=False,
                    logger=None):
    checkpoint = _load_checkpoint(filename, map_location)
    state_dict = checkpoint.get('state_dict',
                                checkpoint.get('model', checkpoint))
    if list(state_dict.keys())[0].startswith('module.'):
        state_dict = {k[7:]: v for k, v in state_dict.items()}
    load_state_dict(model, state_dict, strict, logger)
    return checkpoint


def weights_to_cpu(state_dict):
    return OrderedDict((k, v.cpu()) for k, v in state_dict.items())


def get_state_dict(module):
    return module.state_dict()


def save_checkpoint(model, filename, optimizer=None, meta=None):
    ckpt = {'state_dict': weights_to_cpu(get_state_dict(model)),
            'meta': meta or {}}
    torch.save(ckpt, filename)
