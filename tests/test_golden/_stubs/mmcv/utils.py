"""Registry / build_from_cfg / ConfigDict shims (public mmcv semantics)."""
import functools
import importlib
import inspect
import logging
import os
import subprocess
import warnings


class ConfigDict(dict):
    """dict with attribute access, recursive on construction."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        d = dict(*args, **kwargs)
        for k, v in d.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict) and not isinstance(v, ConfigDict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __setattr__(self, k, v):
        self[k] = self._wrap(v)

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setitem__(self, k, v):
        super().__setitem__(k, self._wrap(v))

    def copy(self):
        return ConfigDict(self)

    def __deepcopy__(self, memo):
        import copy as _copy
        other = ConfigDict()
        memo[id(self)] = other
        for k, v in self.items():
            dict.__setitem__(other, _copy.deepcopy(k, memo),
                             _copy.deepcopy(v, memo))
        return other


class Config:
    """Very small stand-in; golden tests use swindet's own Config loader
    and pass plain dicts, so only attribute-style wrapping is needed."""

    def __init__(self, cfg_dict=None, filename=None):
        self._cfg_dict = ConfigDict(cfg_dict or {})
        self._filename = filename

    def __getattr__(self, name):
        return getattr(self.__dict__['_cfg_dict'], name)

    def __getitem__(self, name):
        return self._cfg_dict[name]


class Registry:
    def __init__(self, name, build_func=None, parent=None, scope=None):
        self._name = name
        self._module_dict = {}

    @property
    def name(self):
        return self._name

    @property
    def module_dict(self):
        return self._module_dict

    def get(self, key):
        return self._module_dict.get(key)

    def _register(self, cls, name=None, force=False):
        key = name if name is not None else cls.__name__
        if not force and key in self._module_dict:
            raise KeyError(f'{key} already registered in {self._name}')
        self._module_dict[key] = cls
        return cls

    def register_module(self, name=None, force=False, module=None):
        if module is not None:
            return self._register(module, name, force)
        if inspect.isclass(name) or inspect.isfunction(name):
            # used as bare decorator @reg.register_module
            return self._register(name)

        def _decorator(cls):
            return self._register(cls, name, force)

        return _decorator

    def __contains__(self, key):
        return key in self._module_dict

    def __repr__(self):
        return f'Registry({self._name}, {list(self._module_dict)})'


def build_from_cfg(cfg, registry, default_args=None):
    if not isinstance(cfg, dict):
        raise TypeError(f'cfg must be a dict, got {type(cfg)}')
    args = cfg.copy()
    if default_args is not None:
        for k, v in default_args.items():
            args.setdefault(k, v)
    obj_type = args.pop('type')
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f'{obj_type} is not in the {registry.name} '
                           'registry')
    else:
        obj_cls = obj_type
    return obj_cls(**args)


def print_log(msg, logger=None, level=logging.INFO):
    if logger is None:
        print(msg)
    elif logger == 'silent':
        pass
    elif isinstance(logger, logging.Logger):
        logger.log(level, msg)
    else:
        logging.getLogger(str(logger)).log(level, msg)


_loggers = {}


def get_logger(name, log_file=None, log_level=logging.INFO):
    if name in _loggers:
        return _loggers[name]
    logger = logging.getLogger(name)
    logger.setLevel(log_level)
    if not logger.handlers:
        logger.addHandler(logging.StreamHandler())
    _loggers[name] = logger
    return logger


def mkdir_or_exist(d):
    os.makedirs(d, exist_ok=True)


def import_modules_from_strings(imports, allow_failed_imports=False):
    if imports is None:
        return
    single = False
    if isinstance(imports, str):
        single = True
        imports = [imports]
    out = []
    for imp in imports:
        try:
            out.append(importlib.import_module(imp))
        except ImportError:
            if not allow_failed_imports:
                raise
            out.append(None)
    return out[0] if single else out


def collect_env():
    import sys
    return {'sys.platform': sys.platform, 'Python': sys.version}


def get_git_hash(fallback='unknown', digits=None):
    return fallback


def is_str(x):
    return isinstance(x, str)


def is_seq_of(seq, expected_type, seq_type=None):
    exp_seq_type = (list, tuple) if seq_type is None else seq_type
    if not isinstance(seq, exp_seq_type):
        return False
    return all(isinstance(item, expected_type) for item in seq)


def is_list_of(seq, expected_type):
    return is_seq_of(seq, expected_type, seq_type=list)


def is_tuple_of(seq, expected_type):
    return is_seq_of(seq, expected_type, seq_type=tuple)


def slice_list(in_list, lens):
    if isinstance(lens, int):
        assert len(in_list) % lens == 0
        lens = [lens] * (len(in_list) // lens)
    out, idx = [], 0
    for n in lens:
        out.append(in_list[idx:idx + n])
        idx += n
    return out


def concat_list(in_list):
    import itertools
    return list(itertools.chain(*in_list))


def deprecated_api_warning(name_dict, cls_name=None):
    def wrapper(func):
        @functools.wraps(func)
        def new_func(*args, **kwargs):
            for src, dst in name_dict.items():
                if src in kwargs:
                    warnings.warn(f'{src} is deprecated, use {dst}')
                    kwargs[dst] = kwargs.pop(src)
            return func(*args, **kwargs)
        return new_func
    return wrapper
