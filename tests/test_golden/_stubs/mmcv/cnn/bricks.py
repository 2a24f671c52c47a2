import torch.nn as nn


class NonLocal2d(nn.Module):
    """Import-time placeholder (BFP's optional refine; not goldened)."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        raise NotImplementedError('NonLocal2d shim is import-only')


def build_plugin_layer(cfg, postfix='', **kwargs):
    raise NotImplementedError('plugin layers not needed by golden tests')
