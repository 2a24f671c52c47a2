from ..registries import DATASETS, PIPELINES
from .builder import (DetDataLoader, GroupBatchSampler, build_dataloader,
                      build_dataset, collate_detection)
from .custom import CustomDataset
from .coco import CocoDataset
from .xml_style import VOCDataset, XMLDataset
from .lvis import LVISDataset, LVISV1Dataset, LVISV05Dataset
from .cityscapes import CityscapesDataset, DeepFashionDataset
from .wider_face import WIDERFaceDataset
from .dataset_wrappers import (ClassBalancedDataset, ConcatDataset,
                               RepeatDataset)
from . import pipelines

__all__ = [
    'DATASETS', 'PIPELINES', 'DetDataLoader', 'GroupBatchSampler',
    'build_dataloader', 'build_dataset', 'collate_detection',
    'CustomDataset', 'CocoDataset', 'VOCDataset', 'XMLDataset',
    'LVISDataset', 'LVISV1Dataset', 'LVISV05Dataset',
    'CityscapesDataset', 'DeepFashionDataset', 'WIDERFaceDataset',
    'ClassBalancedDataset',
    'ConcatDataset', 'RepeatDataset', 'pipelines',
]
