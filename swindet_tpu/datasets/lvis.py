"""LVIS v0.5/v1 datasets (reference: mmdet/datasets/lvis.py:9
LVISV05Dataset, :310 LVISV1Dataset) backed by the native COCO api +
LVISEval (datasets/api/lviseval.py).

The 1203-class v1 / 1230-class v0.5 name tuples default to the frozen
lists in core/eval/class_names.py (so a config-declared ``classes=`` or
name lookup resolves without an annotation file); the annotation
file's own ``categories`` records override them when loaded.
"""
from __future__ import annotations

import os.path as osp
from collections import OrderedDict

import numpy as np

from .builder import DATASETS
from .coco import CocoDataset
from .api.coco_api import COCO
from .api.lviseval import LVISEval
from ..core.eval.class_names import LVIS_CLASSES, LVIS_V1_CLASSES


@DATASETS.register_module()
class LVISV1Dataset(CocoDataset):
    """LVIS v1: file_name derived from coco_url
    (reference: lvis.py:323-341)."""

    CLASSES = LVIS_V1_CLASSES

    def load_annotations(self, ann_file):
        self.coco = COCO(ann_file)
        self.cat_ids = sorted(self.coco.getCatIds())
        cats = self.coco.loadCats(self.cat_ids)
        if cats and all('name' in c for c in cats):
            self.CLASSES = tuple(c['name'] for c in cats)
        self.cat2label = {cat_id: i for i, cat_id in
                          enumerate(self.cat_ids)}
        self.img_ids = self.coco.getImgIds()
        data_infos = []
        for i in self.img_ids:
            info = self.coco.loadImgs([i])[0]
            if 'file_name' in info:
                info['filename'] = info['file_name']
            else:
                # v1: coco_url like http://images.cocodataset.org/
                # train2017/000000391895.jpg → train2017/000000391895.jpg
                coco_url = info['coco_url']
                info['filename'] = coco_url.replace(
                    'http://images.cocodataset.org/', '')
            data_infos.append(info)
        return data_infos

    def evaluate(self, results, metric='bbox', logger=None,
                 jsonfile_prefix=None, classwise=False,
                 proposal_nums=(100, 300, 1000), iou_thrs=None,
                 **kwargs):
        """LVIS protocol eval (reference: lvis.py:238 evaluate) —
        maxDets 300, federated image-category pairs, APr/APc/APf."""
        metrics = metric if isinstance(metric, list) else [metric]
        for m in metrics:
            if m not in ('bbox', 'segm', 'proposal'):
                raise KeyError(f'metric {m} is not supported')
        if isinstance(results[0], tuple):
            bbox_json, segm_json = self._segm2json(results)
            result_lists = {'bbox': bbox_json, 'proposal': bbox_json,
                            'segm': segm_json}
        else:
            det_json = self._det2json(results)
            result_lists = {'bbox': det_json, 'proposal': det_json}

        eval_results = OrderedDict()
        for m in metrics:
            iou_type = 'bbox' if m == 'proposal' else m
            res_list = result_lists[m]
            if len(res_list) == 0:
                eval_results[f'{m}_AP'] = 0.0
                continue
            lvisDt = self.coco.loadRes(res_list)
            lvisEval = LVISEval(self.coco, lvisDt, iou_type)
            lvisEval.params.imgIds = self.img_ids
            lvisEval.params.catIds = self.cat_ids
            if iou_thrs is not None:
                lvisEval.params.iouThrs = np.asarray(iou_thrs)
            if m == 'proposal':
                lvisEval.params.useCats = 0
                lvisEval.params.maxDets = list(proposal_nums)
            lvisEval.evaluate()
            lvisEval.accumulate()
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                lvisEval.summarize()
            if logger is not None:
                logger.info('\n' + buf.getvalue())
            else:
                print(buf.getvalue())
            if m == 'proposal':
                eval_results['AR@300'] = float(lvisEval.stats[-1])
            else:
                for k, v in lvisEval.results.items():
                    eval_results[f'{m}_{k}'] = float(f'{v:.4f}')
        return eval_results


@DATASETS.register_module()
class LVISDataset(LVISV1Dataset):
    """LVIS v0.5 (reference: lvis.py:9) — same machinery; v0.5 files
    carry file_name directly."""

    CLASSES = LVIS_CLASSES


LVISV05Dataset = LVISDataset
DATASETS.register_module(name='LVISV05Dataset', module=LVISDataset,
                         force=True)
