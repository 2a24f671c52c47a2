from .builder import (BACKBONES, DETECTORS, HEADS, LOSSES, NECKS,
                      ROI_EXTRACTORS, build_backbone, build_detector,
                      build_head, build_loss, build_neck)
from .backbones import ResNet, ResNeXt, SwinTransformer
from .necks import FPN
from .dense_heads import (AnchorHead, RepPointsHead, RetinaHead,
                          RPNHead)
from .roi_heads import (ConvFCBBoxHead, FCNMaskHead, Shared2FCBBoxHead,
                        Shared4Conv1FCBBoxHead, SingleRoIExtractor,
                        StandardRoIHead)
from .detectors import (CascadeRCNN, FasterRCNN, MaskRCNN,
                        RepPointsDetector, RetinaNet,
                        SingleStageDetector, TwoStageDetector)
from . import losses

__all__ = [
    'BACKBONES', 'DETECTORS', 'HEADS', 'LOSSES', 'NECKS', 'ROI_EXTRACTORS',
    'build_backbone', 'build_detector', 'build_head', 'build_loss',
    'build_neck', 'SwinTransformer', 'ResNet', 'ResNeXt', 'FPN', 'AnchorHead',
    'RPNHead', 'RetinaHead', 'RepPointsHead', 'RetinaNet',
    'RepPointsDetector', 'SingleStageDetector', 'CascadeRCNN',
    'ConvFCBBoxHead', 'FCNMaskHead', 'Shared2FCBBoxHead',
    'Shared4Conv1FCBBoxHead', 'SingleRoIExtractor', 'StandardRoIHead',
    'FasterRCNN', 'MaskRCNN', 'TwoStageDetector', 'losses',
]
