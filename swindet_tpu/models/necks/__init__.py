from .fpn import FPN
from .pafpn import PAFPN
from .yolo_neck import YOLOV3Neck
from .hrfpn import HRFPN

__all__ = ['FPN', 'PAFPN', 'YOLOV3Neck', 'HRFPN']
