from .iou import bbox_overlaps
from .coders import DeltaXYWHBBoxCoder, bbox2delta, delta2bbox
from .transforms import bbox2result, bbox2roi, bbox_flip
from .assigners import AssignResult, MaxIoUAssigner
from .samplers import PseudoSampler, RandomSampler, SamplingResult
from .lsa import linear_sum_assignment
from . import match_costs  # noqa: F401 — registers MATCH_COSTS entries

__all__ = [
    'bbox_overlaps', 'DeltaXYWHBBoxCoder', 'bbox2delta', 'delta2bbox',
    'bbox2result', 'bbox2roi', 'bbox_flip', 'AssignResult', 'MaxIoUAssigner',
    'PseudoSampler', 'RandomSampler', 'SamplingResult',
    'linear_sum_assignment',
]
