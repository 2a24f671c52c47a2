from .swin import SwinTransformer
from .resnet import ResNet, ResNeXt
from .ssd_vgg import SSDVGG
from .darknet import Darknet
from .res2net import Res2Net
from .regnet import RegNet
from .hrnet import HRNet
from .hourglass import HourglassNet

__all__ = ['SwinTransformer', 'ResNet', 'ResNeXt', 'SSDVGG', 'Darknet', 'Res2Net', 'RegNet', 'HRNet', 'HourglassNet']
