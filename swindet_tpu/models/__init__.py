from .builder import (BACKBONES, DETECTORS, HEADS, LOSSES, NECKS,
                      ROI_EXTRACTORS, build_backbone, build_detector,
                      build_head, build_loss, build_neck)
from .backbones import SwinTransformer
from .necks import FPN
from .dense_heads import AnchorHead, RPNHead
from .roi_heads import (ConvFCBBoxHead, FCNMaskHead, Shared2FCBBoxHead,
                        Shared4Conv1FCBBoxHead, SingleRoIExtractor,
                        StandardRoIHead)
from .detectors import FasterRCNN, MaskRCNN, TwoStageDetector
from . import losses

__all__ = [
    'BACKBONES', 'DETECTORS', 'HEADS', 'LOSSES', 'NECKS', 'ROI_EXTRACTORS',
    'build_backbone', 'build_detector', 'build_head', 'build_loss',
    'build_neck', 'SwinTransformer', 'FPN', 'AnchorHead', 'RPNHead',
    'ConvFCBBoxHead', 'FCNMaskHead', 'Shared2FCBBoxHead',
    'Shared4Conv1FCBBoxHead', 'SingleRoIExtractor', 'StandardRoIHead',
    'FasterRCNN', 'MaskRCNN', 'TwoStageDetector', 'losses',
]
