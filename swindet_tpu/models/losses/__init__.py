from .losses import (AssociativeEmbeddingLoss, BoundedIoULoss,
                     CrossEntropyLoss, FocalLoss, GaussianFocalLoss,
                     GIoULoss, IoULoss, L1Loss, SmoothL1Loss, accuracy,
                     weight_reduce_loss)

__all__ = [
    'AssociativeEmbeddingLoss', 'BoundedIoULoss', 'CrossEntropyLoss',
    'FocalLoss', 'GaussianFocalLoss', 'GIoULoss', 'IoULoss', 'L1Loss',
    'SmoothL1Loss', 'accuracy', 'weight_reduce_loss',
]
