from .swin import SwinTransformer
from .resnet import ResNet, ResNeXt

__all__ = ['SwinTransformer', 'ResNet', 'ResNeXt']
