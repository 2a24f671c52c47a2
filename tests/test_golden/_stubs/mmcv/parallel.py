"""mmcv.parallel shim: DataContainer + passthrough wrappers."""
import torch


class DataContainer:
    def __init__(self, data, stack=False, padding_value=0, cpu_only=False,
                 pad_dims=2):
        self._data = data
        self._stack = stack
        self._padding_value = padding_value
        self._cpu_only = cpu_only
        self._pad_dims = pad_dims

    @property
    def data(self):
        return self._data

    @property
    def stack(self):
        return self._stack

    @property
    def cpu_only(self):
        return self._cpu_only

    @property
    def padding_value(self):
        return self._padding_value

    @property
    def pad_dims(self):
        return self._pad_dims

    def __repr__(self):
        return f'DataContainer({self._data!r})'


def collate(batch, samples_per_gpu=1):
    raise NotImplementedError('collate shim is import-only')


def scatter(inputs, target_gpus, dim=0):
    raise NotImplementedError('scatter shim is import-only')


def is_module_wrapper(module):
    return isinstance(module, (MMDataParallel, MMDistributedDataParallel))


class MMDataParallel(torch.nn.Module):
    def __init__(self, module, **kwargs):
        super().__init__()
        self.module = module

    def forward(self, *args, **kwargs):
        return self.module(*args, **kwargs)


class MMDistributedDataParallel(MMDataParallel):
    pass
