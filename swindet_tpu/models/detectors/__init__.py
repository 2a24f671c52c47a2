from .two_stage import (CascadeRCNN, FasterRCNN, HybridTaskCascade, MaskRCNN, MaskScoringRCNN,
                        TwoStageDetector)
from .single_stage import (ATSS, FCOS, FSAF, GFL, RepPointsDetector, RetinaNet, VFNet, YOLOV3,
                           SingleStageDetector)
from .detr import DETR
from .sparse_rcnn import SparseRCNN

__all__ = ['CascadeRCNN', 'FasterRCNN', 'HybridTaskCascade', 'MaskRCNN', 'MaskScoringRCNN', 'TwoStageDetector',
           'ATSS', 'FCOS', 'FSAF', 'GFL', 'RepPointsDetector', 'RetinaNet',
           'SingleStageDetector', 'VFNet', 'YOLOV3', 'DETR', 'SparseRCNN']
