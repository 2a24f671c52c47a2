from .class_names import (COCO_CLASSES, VOC_CLASSES, get_classes)
from .mean_ap import average_precision, eval_map, eval_recalls

__all__ = ['COCO_CLASSES', 'VOC_CLASSES', 'get_classes',
           'average_precision', 'eval_map', 'eval_recalls']
