from .transforms import (PIPELINES, Compose, LoadImageFromFile,
                         LoadImageFromWebcam, LoadAnnotations, Resize,
                         RandomFlip, Normalize, Pad, RandomCrop,
                         AutoAugment, PhotoMetricDistortion,
                         MultiScaleFlipAug, ImageToTensor,
                         DefaultFormatBundle, Collect, FilterAnnotations)

from .extra_augs import (Expand, MinIoURandomCrop, CutOut, Shear, Rotate,
                         Translate, ColorTransform, EqualizeTransform,
                         BrightnessTransform, ContrastTransform, Corrupt, SegRescale)

__all__ = [
    'PIPELINES', 'Compose', 'LoadImageFromFile', 'LoadImageFromWebcam',
    'LoadAnnotations', 'Resize', 'RandomFlip', 'Normalize', 'Pad',
    'RandomCrop', 'AutoAugment', 'PhotoMetricDistortion',
    'MultiScaleFlipAug', 'ImageToTensor', 'DefaultFormatBundle', 'Collect',
    'FilterAnnotations', 'Expand', 'MinIoURandomCrop', 'CutOut', 'Shear',
    'Rotate', 'Translate', 'ColorTransform', 'EqualizeTransform',
    'BrightnessTransform', 'ContrastTransform', 'Corrupt', 'SegRescale',
]
