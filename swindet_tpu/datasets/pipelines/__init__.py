from .transforms import (PIPELINES, Compose, LoadImageFromFile,
                         LoadImageFromWebcam, LoadAnnotations, Resize,
                         RandomFlip, Normalize, Pad, RandomCrop,
                         AutoAugment, PhotoMetricDistortion,
                         MultiScaleFlipAug, ImageToTensor,
                         DefaultFormatBundle, Collect, FilterAnnotations)

__all__ = [
    'PIPELINES', 'Compose', 'LoadImageFromFile', 'LoadImageFromWebcam',
    'LoadAnnotations', 'Resize', 'RandomFlip', 'Normalize', 'Pad',
    'RandomCrop', 'AutoAugment', 'PhotoMetricDistortion',
    'MultiScaleFlipAug', 'ImageToTensor', 'DefaultFormatBundle', 'Collect',
    'FilterAnnotations',
]
