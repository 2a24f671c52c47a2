from .anchor_head import AnchorHead
from .rpn_head import RPNHead
from .retina_head import RetinaHead
from .reppoints_head import RepPointsHead
from .fcos_head import FCOSHead
from .atss_head import ATSSHead
from .gfl_head import GFLHead
from .ssd_head import SSDHead
from .yolo_head import YOLOV3Head
from .free_anchor_retina_head import FreeAnchorRetinaHead
from .vfnet_head import VFNetHead
from .fsaf_head import FSAFHead
from .detr_head import TransformerHead
from .embedding_rpn_head import EmbeddingRPNHead
from .guided_anchor_head import (FeatureAdaption, GARetinaHead, GARPNHead,
                                 GuidedAnchorHead)
from .corner_head import CentripetalHead, CornerHead
from .fovea_head import FoveaHead
from .ld_head import LDHead
from .sabl_retina_head import SABLRetinaHead
from .paa_head import PAAHead
from .yolact_head import YOLACTHead, YOLACTProtonet, YOLACTSegmHead
from .pisa_heads import PISARetinaHead, PISASSDHead
from .retina_sepbn_head import RetinaSepBNHead
from .cascade_rpn_head import CascadeRPNHead, StageCascadeRPNHead

__all__ = ['AnchorHead', 'RPNHead', 'RetinaHead', 'RepPointsHead',
           'FCOSHead', 'ATSSHead', 'GFLHead', 'SSDHead', 'YOLOV3Head', 'FreeAnchorRetinaHead', 'VFNetHead', 'FSAFHead',
           'TransformerHead', 'EmbeddingRPNHead', 'GuidedAnchorHead',
           'GARPNHead', 'GARetinaHead', 'FeatureAdaption', 'CornerHead', 'CentripetalHead', 'FoveaHead', 'LDHead', 'SABLRetinaHead', 'PAAHead', 'YOLACTHead', 'YOLACTSegmHead',
           'YOLACTProtonet', 'PISARetinaHead', 'PISASSDHead', 'RetinaSepBNHead', 'CascadeRPNHead', 'StageCascadeRPNHead']
from .nasfcos_head import NASFCOSHead
__all__ += ['NASFCOSHead']
