from .anchors import (AnchorGenerator, PointGenerator, anchor_inside_flags,
                      images_to_levels)
from .nms import NMSResult, batched_nms, multiclass_nms, nms
from .bbox.iou import bbox_overlaps
from .bbox.coders import (DeltaXYWHBBoxCoder, DistancePointBBoxCoder,
                          bbox2delta, delta2bbox, distance2bbox)
from .bbox.transforms import (bbox2result, bbox2roi, bbox_flip, bbox_mapping,
                              bbox_mapping_back, roi2bbox)
from .bbox.assigners import AssignResult, MaxIoUAssigner
from .bbox.samplers import PseudoSampler, RandomSampler, SamplingResult

__all__ = [
    'AnchorGenerator', 'PointGenerator', 'anchor_inside_flags',
    'images_to_levels', 'NMSResult', 'batched_nms', 'multiclass_nms', 'nms',
    'bbox_overlaps', 'DeltaXYWHBBoxCoder', 'DistancePointBBoxCoder',
    'bbox2delta', 'delta2bbox', 'distance2bbox', 'bbox2result', 'bbox2roi',
    'bbox_flip', 'bbox_mapping', 'bbox_mapping_back', 'roi2bbox',
    'AssignResult', 'MaxIoUAssigner', 'PseudoSampler', 'RandomSampler',
    'SamplingResult',
]
