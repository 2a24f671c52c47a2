from .anchor_head import AnchorHead
from .rpn_head import RPNHead
from .retina_head import RetinaHead
from .reppoints_head import RepPointsHead
from .fcos_head import FCOSHead

__all__ = ['AnchorHead', 'RPNHead', 'RetinaHead', 'RepPointsHead',
           'FCOSHead']
