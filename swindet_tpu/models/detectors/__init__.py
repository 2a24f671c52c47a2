from .two_stage import (CascadeRCNN, FasterRCNN, MaskRCNN,
                        TwoStageDetector)
from .single_stage import (FCOS, RepPointsDetector, RetinaNet,
                           SingleStageDetector)

__all__ = ['CascadeRCNN', 'FasterRCNN', 'MaskRCNN', 'TwoStageDetector',
           'FCOS', 'RepPointsDetector', 'RetinaNet',
           'SingleStageDetector']
