"""Pascal-VOC XML dataset (reference: mmdet/datasets/xml_style.py,
voc.py) — VOC-style annotations + VOC mAP evaluation."""
from __future__ import annotations

import os.path as osp
import xml.etree.ElementTree as ET

import numpy as np

from ..registries import DATASETS
from .custom import CustomDataset


@DATASETS.register_module()
class XMLDataset(CustomDataset):
    """Annotations in VOC XML; ann_file lists image ids (one per line)."""

    def __init__(self, min_size=None, img_subdir='JPEGImages',
                 ann_subdir='Annotations', **kwargs):
        self.img_subdir = img_subdir
        self.ann_subdir = ann_subdir
        self.min_size = min_size
        super().__init__(**kwargs)
        self.cat2label = {c: i for i, c in enumerate(self.CLASSES)}

    def load_annotations(self, ann_file):
        data_infos = []
        with open(ann_file) as f:
            img_ids = [line.strip() for line in f if line.strip()]
        for img_id in img_ids:
            filename = osp.join(self.img_subdir, f'{img_id}.jpg')
            xml_path = osp.join(self.img_prefix, self.ann_subdir,
                                f'{img_id}.xml')
            width, height = 0, 0
            if osp.exists(xml_path):
                root = ET.parse(xml_path).getroot()
                size = root.find('size')
                if size is not None:
                    width = int(size.find('width').text)
                    height = int(size.find('height').text)
            data_infos.append(dict(id=img_id, filename=filename,
                                   width=width, height=height))
        return data_infos

    def _filter_imgs(self, min_size=32):
        """(reference xml_style.py:61): keep images big enough and, when
        filter_empty_gt, containing at least one class instance."""
        valid = []
        for i, info in enumerate(self.data_infos):
            if min(info['width'], info['height']) < min_size:
                continue
            if self.filter_empty_gt:
                if len(self.get_ann_info(i)['labels']) == 0:
                    continue
            valid.append(i)
        return valid

    def get_ann_info(self, idx):
        cat2label = {c: i for i, c in enumerate(self.CLASSES)}
        img_id = self.data_infos[idx]['id']
        xml_path = osp.join(self.img_prefix, self.ann_subdir,
                            f'{img_id}.xml')
        bboxes, labels, bboxes_ignore, labels_ignore = [], [], [], []
        if osp.exists(xml_path):
            root = ET.parse(xml_path).getroot()
            for obj in root.findall('object'):
                name = obj.find('name').text
                if name not in cat2label:
                    continue
                difficult = obj.find('difficult')
                difficult = 0 if difficult is None else int(difficult.text)
                bnd = obj.find('bndbox')
                bbox = [int(float(bnd.find(t).text)) for t in
                        ('xmin', 'ymin', 'xmax', 'ymax')]
                ignore = False
                if self.min_size:
                    w = bbox[2] - bbox[0]
                    h = bbox[3] - bbox[1]
                    ignore = w < self.min_size or h < self.min_size
                if difficult or ignore:
                    bboxes_ignore.append(bbox)
                    labels_ignore.append(cat2label[name])
                else:
                    bboxes.append(bbox)
                    labels.append(cat2label[name])
        return dict(
            bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int64).reshape(-1),
            bboxes_ignore=np.asarray(bboxes_ignore,
                                     np.float32).reshape(-1, 4),
            labels_ignore=np.asarray(labels_ignore, np.int64).reshape(-1),
            masks=[None] * len(bboxes))


@DATASETS.register_module()
class VOCDataset(XMLDataset):
    CLASSES = ('aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus',
               'car', 'cat', 'chair', 'cow', 'diningtable', 'dog',
               'horse', 'motorbike', 'person', 'pottedplant', 'sheep',
               'sofa', 'train', 'tvmonitor')

    def evaluate(self, results, metric='mAP', logger=None, iou_thr=0.5,
                 **kwargs):
        from ..core.eval.mean_ap import eval_map, eval_recalls
        annotations = [self.get_ann_info(i) for i in range(len(self))]
        if metric == 'recall':
            gts = [a['bboxes'] for a in annotations]
            proposals = [np.vstack([r for r in res]) for res in results]
            rec = eval_recalls(gts, proposals, logger=logger)
            return {'recall': rec}
        mean_ap, _ = eval_map(results, annotations, iou_thr=iou_thr,
                              logger=logger)
        return {'mAP': mean_ap}
