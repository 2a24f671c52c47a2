"""Model registries + builders (reference: mmdet/models/builder.py:6-12).

One flat set of registries; every component in configs is named by a
registry string and instantiated via ``build_from_cfg``.
"""
from __future__ import annotations

from typing import Optional

from ..utils.registry import build_from_cfg
from ..registries import (ANCHOR_GENERATORS, BACKBONES, BBOX_ASSIGNERS,
                          BBOX_CODERS, BBOX_SAMPLERS, DETECTORS, HEADS,
                          IOU_CALCULATORS, LOSSES, NECKS, ROI_EXTRACTORS,
                          SHARED_HEADS)


def build_backbone(cfg):
    return build_from_cfg(cfg, BACKBONES)


def build_neck(cfg):
    return build_from_cfg(cfg, NECKS)


def build_roi_extractor(cfg):
    return build_from_cfg(cfg, ROI_EXTRACTORS)


def build_shared_head(cfg):
    return build_from_cfg(cfg, SHARED_HEADS)


def build_head(cfg):
    return build_from_cfg(cfg, HEADS)


def build_loss(cfg):
    return build_from_cfg(cfg, LOSSES)


def build_bbox_coder(cfg):
    return build_from_cfg(cfg, BBOX_CODERS)


def build_assigner(cfg):
    return build_from_cfg(cfg, BBOX_ASSIGNERS)


def build_sampler(cfg, **default_args):
    return build_from_cfg(cfg, BBOX_SAMPLERS, default_args or None)


def build_anchor_generator(cfg):
    return build_from_cfg(cfg, ANCHOR_GENERATORS)


def build_detector(cfg, train_cfg: Optional[dict] = None,
                   test_cfg: Optional[dict] = None):
    """Build a detector; cfg-level train_cfg/test_cfg take priority
    (reference semantics: mmdet/models/builder.py build_detector)."""
    cfg = dict(cfg)
    if isinstance(cfg.get('dtype'), str):
        import jax.numpy as jnp
        cfg['dtype'] = dict(bfloat16=jnp.bfloat16, float32=jnp.float32,
                            float16=jnp.float16)[cfg['dtype']]
    if train_cfg is not None or test_cfg is not None:
        assert cfg.get('train_cfg') is None or train_cfg is None, \
            'train_cfg specified in both outer field and model field'
        assert cfg.get('test_cfg') is None or test_cfg is None, \
            'test_cfg specified in both outer field and model field'
        cfg.setdefault('train_cfg', train_cfg)
        cfg.setdefault('test_cfg', test_cfg)
    cfg.pop('pretrained', None)
    return build_from_cfg(cfg, DETECTORS)
