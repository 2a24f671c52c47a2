from .roi_extractor import SingleRoIExtractor
from .bbox_heads import (BBoxHead, ConvFCBBoxHead, Shared2FCBBoxHead,
                         Shared4Conv1FCBBoxHead)
from .mask_heads import FCNMaskHead
from .standard_roi_head import StandardRoIHead
from .cascade_roi_head import CascadeRoIHead
from .htc_roi_head import (FusedSemanticHead, HTCMaskHead,
                           HybridTaskCascadeRoIHead)
from .mask_scoring_roi_head import MaskIoUHead, MaskScoringRoIHead
from .double_roi_head import DoubleConvFCBBoxHead, DoubleHeadRoIHead
from .dynamic_roi_head import DynamicRoIHead
from .pisa_roi_head import PISARoIHead
from .sparse_roi_head import DIIHead, SparseRoIHead
from .point_rend import (CoarseMaskHead, MaskPointHead,
                         PointRendRoIHead)
from .grid_rcnn import GridHead, GridRoIHead
from .sabl_head import SABLHead
from .scnet import (FeatureRelayHead, GlobalContextHead, SCNetBBoxHead,
                    SCNetMaskHead, SCNetRoIHead, SCNetSemanticHead)

__all__ = ['SingleRoIExtractor', 'BBoxHead', 'ConvFCBBoxHead',
           'Shared2FCBBoxHead', 'Shared4Conv1FCBBoxHead', 'FCNMaskHead',
           'CascadeRoIHead', 'StandardRoIHead', 'FusedSemanticHead',
           'HTCMaskHead', 'HybridTaskCascadeRoIHead', 'MaskIoUHead', 'MaskScoringRoIHead', 'DoubleConvFCBBoxHead', 'DoubleHeadRoIHead', 'DynamicRoIHead', 'PISARoIHead', 'DIIHead', 'SparseRoIHead', 'CoarseMaskHead', 'MaskPointHead',
           'PointRendRoIHead', 'GridHead', 'GridRoIHead', 'SCNetRoIHead', 'SCNetBBoxHead',
           'SCNetMaskHead', 'SCNetSemanticHead', 'GlobalContextHead',
           'FeatureRelayHead', 'SABLHead']
from .shared_heads import ResLayer
