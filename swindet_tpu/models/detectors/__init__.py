from .two_stage import (CascadeRCNN, FastRCNN, FasterRCNN, TridentFasterRCNN, GridRCNN, PointRend, SCNet, HybridTaskCascade, MaskRCNN, MaskScoringRCNN,
                        TwoStageDetector)
from .single_stage import (ATSS, FCOS, FOVEA, FSAF, GFL, NASFCOS, PAA,
                           KnowledgeDistillationSingleStageDetector, CentripetalNet, CornerNet, RepPointsDetector, RetinaNet, VFNet, YOLOV3,
                           SingleStageDetector)
from .detr import DETR
from .rpn import RPN
from .yolact import YOLACT
from .sparse_rcnn import SparseRCNN

__all__ = ['CascadeRCNN', 'FastRCNN', 'FasterRCNN', 'HybridTaskCascade', 'MaskRCNN', 'MaskScoringRCNN', 'TwoStageDetector',
           'ATSS', 'FCOS', 'FSAF', 'GFL', 'RepPointsDetector', 'RetinaNet',
           'SingleStageDetector', 'VFNet', 'YOLOV3', 'DETR', 'SparseRCNN',
           'RPN', 'CornerNet', 'CentripetalNet', 'FOVEA', 'GridRCNN', 'PointRend', 'SCNet',
           'KnowledgeDistillationSingleStageDetector', 'PAA', 'YOLACT', 'NASFCOS', 'TridentFasterRCNN']
