"""WIDERFaceDataset (reference: mmdet/datasets/wider_face.py:11) —
WIDER Face in PASCAL-VOC XML layout; the annotation index lists image
ids whose XMLs carry a ``folder`` the jpg lives under.
"""
from __future__ import annotations

import os.path as osp
import xml.etree.ElementTree as ET

from .builder import DATASETS
from .xml_style import XMLDataset


@DATASETS.register_module()
class WIDERFaceDataset(XMLDataset):

    CLASSES = ('face',)

    def load_annotations(self, ann_file):
        data_infos = []
        with open(ann_file) as f:
            img_ids = [line.strip() for line in f if line.strip()]
        for img_id in img_ids:
            filename = f'{img_id}.jpg'
            xml_path = osp.join(self.img_prefix, self.ann_subdir,
                                f'{img_id}.xml')
            width = height = 0
            folder = ''
            if osp.exists(xml_path):
                root = ET.parse(xml_path).getroot()
                size = root.find('size')
                if size is not None:
                    width = int(size.find('width').text)
                    height = int(size.find('height').text)
                node = root.find('folder')
                folder = node.text if node is not None else ''
            data_infos.append(dict(
                id=img_id, filename=osp.join(folder, filename),
                width=width, height=height))
        return data_infos
