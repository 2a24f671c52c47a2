from .swin import SwinTransformer
from .resnet import ResNet, ResNeXt
from .ssd_vgg import SSDVGG
from .darknet import Darknet

__all__ = ['SwinTransformer', 'ResNet', 'ResNeXt', 'SSDVGG', 'Darknet']
