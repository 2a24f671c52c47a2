"""Registry: string-keyed component registry + ``build_from_cfg``.

TPU-native re-implementation of the registry pattern the reference uses
throughout (reference: mmdet/models/builder.py:6-12, mmcv Registry). The
public surface is kept so that the reference's ``configs/**.py`` files,
which name every module by its registry string, work unchanged.
"""
from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    """A string -> class/function registry.

    Example:
        BACKBONES = Registry('backbone')

        @BACKBONES.register_module()
        class SwinTransformer: ...

        build_from_cfg(dict(type='SwinTransformer', embed_dim=96), BACKBONES)
    """

    def __init__(self, name: str, parent: Optional["Registry"] = None):
        self._name = name
        self._module_dict: Dict[str, Any] = {}
        self._parent = parent
        self._children: Dict[str, "Registry"] = {}

    @property
    def name(self) -> str:
        return self._name

    @property
    def module_dict(self) -> Dict[str, Any]:
        return self._module_dict

    def __len__(self) -> int:
        return len(self._module_dict)

    def __contains__(self, key: str) -> bool:
        return self.get(key) is not None

    def __repr__(self) -> str:
        return (f'Registry(name={self._name}, '
                f'items={list(self._module_dict)})')

    def get(self, key: str) -> Optional[Any]:
        """Look up ``key``, falling back to the parent registry."""
        if key in self._module_dict:
            return self._module_dict[key]
        if self._parent is not None:
            return self._parent.get(key)
        return None

    def _register(self, cls: Any, name: Optional[str] = None,
                  force: bool = False) -> None:
        names = [name] if isinstance(name, str) else (name or [cls.__name__])
        for n in names:
            if not force and n in self._module_dict:
                raise KeyError(f'{n} is already registered in {self._name}')
            self._module_dict[n] = cls

    def register_module(self, name: Optional[str] = None, force: bool = False,
                        module: Optional[Any] = None) -> Callable:
        """Register a class/function; usable as decorator or direct call."""
        if module is not None:
            self._register(module, name=name, force=force)
            return module

        def _decorator(cls):
            self._register(cls, name=name, force=force)
            return cls

        return _decorator


def build_from_cfg(cfg: Dict[str, Any], registry: Registry,
                   default_args: Optional[Dict[str, Any]] = None) -> Any:
    """Instantiate ``cfg['type']`` from ``registry`` with remaining keys as
    kwargs (reference semantics: mmcv build_from_cfg)."""
    if not isinstance(cfg, dict):
        raise TypeError(f'cfg must be a dict, got {type(cfg)}')
    if 'type' not in cfg:
        if default_args is None or 'type' not in default_args:
            raise KeyError(f'cfg must contain the key "type": {cfg}')
    args = dict(cfg)
    if default_args is not None:
        for k, v in default_args.items():
            args.setdefault(k, v)
    obj_type = args.pop('type')
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f'{obj_type} is not in the {registry.name} '
                           f'registry. Available: {sorted(registry.module_dict)}')
    elif inspect.isclass(obj_type) or inspect.isfunction(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f'type must be a str or class, got {type(obj_type)}')
    try:
        return obj_cls(**args)
    except Exception as e:  # re-raise with context for config debugging
        raise type(e)(f'{obj_cls.__name__}: {e}') from e
