from .losses import (CrossEntropyLoss, FocalLoss, GIoULoss, IoULoss, L1Loss,
                     SmoothL1Loss, accuracy, weight_reduce_loss)

__all__ = [
    'CrossEntropyLoss', 'FocalLoss', 'GIoULoss', 'IoULoss', 'L1Loss',
    'SmoothL1Loss', 'accuracy', 'weight_reduce_loss',
]
