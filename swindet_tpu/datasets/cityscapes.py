"""CityscapesDataset (reference: mmdet/datasets/cityscapes.py:20) —
COCO-format annotations with the 8 cityscapes instance classes,
all-iscrowd image filtering, and txt/png submission dumping.

Evaluation: COCO-protocol bbox/segm via the native COCOeval
(`metric='bbox'`). The reference's cityscapes-protocol mAP requires the
`cityscapesscripts` package; when requested it raises with that
explanation rather than silently falling back.
"""
from __future__ import annotations

import os.path as osp

import numpy as np

from .builder import DATASETS
from .coco import CocoDataset


@DATASETS.register_module()
class CityscapesDataset(CocoDataset):

    CLASSES = ('person', 'rider', 'car', 'truck', 'bus', 'train',
               'motorcycle', 'bicycle')

    def _filter_imgs(self, min_size=32):
        """(reference :25): drop images whose annotations are all
        iscrowd, plus the usual empty/small filters."""
        valid_inds = []
        ids_with_ann = set(a['image_id'] for a in self.coco.anns.values())
        valid_img_ids = []
        for i, img_info in enumerate(self.data_infos):
            img_id = img_info['id']
            ann_info = self.coco.loadAnns(
                self.coco.getAnnIds(imgIds=[img_id]))
            all_iscrowd = all(a.get('iscrowd', 0) for a in ann_info)
            if self.filter_empty_gt and (img_id not in ids_with_ann
                                         or all_iscrowd):
                continue
            if min(img_info['width'], img_info['height']) >= min_size:
                valid_inds.append(i)
                valid_img_ids.append(img_id)
        self.img_ids = valid_img_ids
        return valid_inds

    def _parse_ann_info(self, img_info, ann_info):
        ann = super()._parse_ann_info(img_info, ann_info)
        if 'segm_file' in img_info:
            ann['seg_map'] = img_info['segm_file']
        return ann

    def results2txt(self, results, outfile_prefix):
        """Dump per-image txt + instance pngs in the cityscapes
        submission layout (reference :107)."""
        import cv2
        import os
        os.makedirs(osp.dirname(osp.abspath(outfile_prefix + '_x')) or '.',
                    exist_ok=True)
        result_files = []
        for idx, result in enumerate(results):
            filename = self.data_infos[idx]['filename']
            basename = osp.splitext(osp.basename(filename))[0]
            pred_txt = f'{outfile_prefix}{basename}_pred.txt'
            bbox_result, segm_result = (
                result if isinstance(result, tuple) else (result, None))
            with open(pred_txt, 'w') as f:
                for label in range(len(bbox_result)):
                    bboxes = bbox_result[label]
                    cls = self.CLASSES[label]
                    for j, bbox in enumerate(bboxes):
                        score = float(bbox[-1])
                        if segm_result is not None:
                            mask = segm_result[label][j]
                            if isinstance(mask, dict):
                                from ..core.masks import rle_to_mask
                                mask = rle_to_mask(mask)
                            png = (f'{outfile_prefix}{basename}'
                                   f'_{label}_{j}.png')
                            cv2.imwrite(png,
                                        mask.astype(np.uint8) * 255)
                            f.write(f'{osp.basename(png)} {cls} '
                                    f'{score}\n')
                        else:
                            f.write(f'{cls} {score} '
                                    + ' '.join(f'{v:.2f}'
                                               for v in bbox[:4])
                                    + '\n')
            result_files.append(pred_txt)
        return result_files

    def evaluate(self, results, metric='bbox', logger=None, **kwargs):
        metrics = metric if isinstance(metric, list) else [metric]
        if 'cityscapes' in metrics:
            raise NotImplementedError(
                'cityscapes-protocol mAP needs the cityscapesscripts '
                'package (not in this environment); use metric="bbox"/'
                '"segm" for the COCO-protocol numbers the reference '
                'also reports')
        return super().evaluate(results, metric=metrics, logger=logger,
                                **kwargs)


@DATASETS.register_module()
class DeepFashionDataset(CocoDataset):
    """(reference: mmdet/datasets/deepfashion.py)."""

    CLASSES = ('top', 'skirt', 'leggings', 'dress', 'outer', 'pants',
               'bag', 'neckwear', 'headwear', 'eyeglass', 'belt',
               'footwear', 'hair', 'skin', 'face')
