from .coco_api import COCO
from .cocoeval import COCOeval

__all__ = ['COCO', 'COCOeval']
