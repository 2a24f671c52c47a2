from .two_stage import (CascadeRCNN, FasterRCNN, MaskRCNN,
                        TwoStageDetector)
from .single_stage import (ATSS, FCOS, GFL, RepPointsDetector, RetinaNet, YOLOV3,
                           SingleStageDetector)

__all__ = ['CascadeRCNN', 'FasterRCNN', 'MaskRCNN', 'TwoStageDetector',
           'ATSS', 'FCOS', 'GFL', 'RepPointsDetector', 'RetinaNet',
           'SingleStageDetector', 'YOLOV3']
