from .inference import (DetectorHandle, async_inference_detector,
                        inference_detector, init_detector,
                        show_result, imshow_gt_det_bboxes)
from .test import multi_gpu_test, single_gpu_test
from .train import set_random_seed, train_detector

__all__ = [
    'DetectorHandle', 'async_inference_detector', 'inference_detector',
    'init_detector', 'show_result',
    'imshow_gt_det_bboxes',
    'multi_gpu_test', 'single_gpu_test', 'set_random_seed',
    'train_detector',
]
