from .fpn import FPN
from .pafpn import PAFPN
from .yolo_neck import YOLOV3Neck
from .fpn_carafe import FPN_CARAFE
from .rfp import RFP
from .hrfpn import HRFPN
from .bfp import BFP
from .channel_mapper import ChannelMapper
from .nas_fpn import NASFPN

__all__ = ['FPN', 'PAFPN', 'YOLOV3Neck', 'HRFPN', 'BFP', 'ChannelMapper', 'NASFPN']
__all__ += ['FPN_CARAFE', 'RFP']
from .nasfcos_fpn import NASFCOS_FPN
__all__ += ['NASFCOS_FPN']
from .fpg import FPG
__all__ += ['FPG']
