from .swin import SwinTransformer
from .resnet import ResNet, ResNeXt
from .ssd_vgg import SSDVGG
from .darknet import Darknet
from .res2net import Res2Net
from .regnet import RegNet
from .hrnet import HRNet
from .hourglass import HourglassNet
from .resnest import ResNeSt
from .detectors_resnet import DetectoRS_ResNet

__all__ = ['SwinTransformer', 'ResNet', 'ResNeXt', 'SSDVGG', 'Darknet', 'Res2Net', 'RegNet', 'HRNet', 'HourglassNet', 'ResNeSt', 'DetectoRS_ResNet']
from .trident_resnet import TridentResNet
