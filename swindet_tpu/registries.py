"""All framework registries in one leaf module (reference:
mmdet/models/builder.py:6-12, mmdet/core/bbox/builder.py,
mmdet/core/anchor/builder.py).

Lives at package top level, importing only ``utils.registry``, so that
``core`` and ``models`` can both register components without cycles.
"""
from .utils.registry import Registry

BACKBONES = Registry('backbone')
NECKS = Registry('neck')
ROI_EXTRACTORS = Registry('roi_extractor')
SHARED_HEADS = Registry('shared_head')
HEADS = Registry('head')
LOSSES = Registry('loss')
DETECTORS = Registry('detector')

BBOX_CODERS = Registry('bbox_coder')
BBOX_ASSIGNERS = Registry('bbox_assigner')
BBOX_SAMPLERS = Registry('bbox_sampler')
ANCHOR_GENERATORS = Registry('anchor_generator')
IOU_CALCULATORS = Registry('iou_calculator')
MATCH_COSTS = Registry('match_cost')

DATASETS = Registry('dataset')
PIPELINES = Registry('pipeline')
