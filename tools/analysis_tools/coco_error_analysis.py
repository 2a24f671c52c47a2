"""COCO error-type analysis: C75/C50/Loc/Sim/Oth/BG/FN stacked PR
curves per category and area (reference:
tools/analysis_tools/coco_error_analysis.py), on the native COCO api.
"""
import argparse
import copy
import os
import os.path as osp
import sys
from multiprocessing import Pool

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))

from swindet_tpu.datasets.api.coco_api import COCO
from swindet_tpu.datasets.api.cocoeval import COCOeval

TYPES = ['C75', 'C50', 'Loc', 'Sim', 'Oth', 'BG', 'FN']
AREAS = ['allarea', 'small', 'medium', 'large']


def makeplot(rs, ps, out_dir, class_name, iou_type):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    cs = np.vstack([
        np.ones((2, 3)),
        np.array([0.31, 0.51, 0.74]),
        np.array([0.75, 0.31, 0.30]),
        np.array([0.36, 0.90, 0.38]),
        np.array([0.50, 0.39, 0.64]),
        np.array([1, 0.6, 0]),
    ])
    for i, area in enumerate(AREAS):
        area_ps = ps[..., i, 0]
        title = f'{iou_type}-{class_name}-{area}'
        aps = [p.mean() for p in area_ps]
        curves = [p.mean(axis=1) if p.ndim > 1 else p for p in area_ps]
        curves.insert(0, np.zeros(curves[0].shape))
        fig = plt.figure()
        ax = plt.subplot(111)
        for k in range(len(TYPES)):
            ax.plot(rs, curves[k + 1], color=[0, 0, 0], linewidth=0.5)
            ax.fill_between(rs, curves[k], curves[k + 1], color=cs[k],
                            label=f'[{aps[k]:.3f}]{TYPES[k]}')
        plt.xlabel('recall')
        plt.ylabel('precision')
        plt.xlim(0, 1.0)
        plt.ylim(0, 1.0)
        plt.title(title)
        plt.legend()
        fig.savefig(osp.join(out_dir, f'{title}.png'))
        plt.close(fig)


def _eval_with(gt, dt, iou_type, iou_thrs, areas=None):
    e = COCOeval(gt, dt, iou_type)
    e.params.imgIds = gt.getImgIds()
    e.params.maxDets = [100]
    e.params.iouThrs = np.asarray(iou_thrs)
    e.params.useCats = 1
    if areas:
        e.params.areaRng = [[0 ** 2, areas[2]], [0 ** 2, areas[0]],
                            [areas[0], areas[1]], [areas[1], areas[2]]]
    e.evaluate()
    e.accumulate()
    return e


def analyze_individual_category(k, cocoDt, cocoGt, catId, iou_type,
                                areas=None):
    """Loc-IoU (0.1) precision with (a) same-supercategory confusion
    ignored, (b) all class confusion ignored (reference :173)."""
    nm = cocoGt.loadCats([catId])[0]
    print(f'analyzing {k + 1}-{nm["name"]}')
    dt = copy.deepcopy(cocoDt)
    dt.dataset['annotations'] = [
        a for a in dt.dataset['annotations']
        if a['category_id'] == catId]
    dt.createIndex()

    ps_ = {}
    for mode in ('supercategory', 'allcategory'):
        gt = copy.deepcopy(cocoGt)
        if mode == 'supercategory':
            child = set(cocoGt.getCatIds(
                supNms=[nm.get('supercategory', nm['name'])]))
        for ann in gt.dataset['annotations']:
            other = (ann['category_id'] in child
                     and ann['category_id'] != catId) \
                if mode == 'supercategory' else \
                ann['category_id'] != catId
            if other:
                ann['ignore'] = 1
                ann['iscrowd'] = 1
                ann['category_id'] = catId
        gt.createIndex()
        e = _eval_with(gt, copy.deepcopy(dt), iou_type, [0.1], areas)
        ps_[f'ps_{mode}'] = e.eval['precision'][0, :, k, :, :]
    return k, ps_


def analyze_results(res_file, ann_file, res_types, out_dir, areas=None,
                    nproc=4):
    cocoGt = COCO(ann_file)
    import json
    with open(res_file) as f:
        res = json.load(f)
    cocoDt = cocoGt.loadRes(res)
    for res_type in res_types:
        assert res_type in ('bbox', 'segm')
        res_out = osp.join(out_dir, res_type)
        os.makedirs(res_out, exist_ok=True)
        e = _eval_with(copy.deepcopy(cocoGt), copy.deepcopy(cocoDt),
                       res_type, [0.75, 0.5, 0.1], areas)
        ps = e.eval['precision']
        ps = np.vstack([ps, np.zeros((4, *ps.shape[1:]))])
        catIds = sorted(cocoGt.getCatIds())
        recThrs = e.params.recThrs
        args = [(k, cocoDt, cocoGt, catId, res_type, areas)
                for k, catId in enumerate(catIds)]
        if nproc > 1:
            with Pool(processes=nproc) as pool:
                outs = pool.starmap(analyze_individual_category, args)
        else:
            outs = [analyze_individual_category(*a) for a in args]
        for k, catId in enumerate(catIds):
            nm = cocoGt.loadCats([catId])[0]
            _, ps_ = outs[k]
            # C75/C50/Loc from the main run; Sim/Oth from the modified
            # gts; BG = 1 beyond Oth recall; FN = 1 (reference :287-300)
            ps[3, :, k, :, :] = ps_['ps_supercategory']
            ps[4, :, k, :, :] = ps_['ps_allcategory']
            ps[ps == -1] = 0
            ps[5, :, k, :, :] = ps[4, :, k, :, :] > 0
            ps[6, :, k, :, :] = 1.0
            makeplot(recThrs, ps[:, :, k], res_out,
                     nm['name'].replace('/', '_'), res_type)
        makeplot(recThrs, ps, res_out, 'allclass', res_type)


def main():
    parser = argparse.ArgumentParser(
        description='COCO error analysis tool')
    parser.add_argument('result', help='result json file path')
    parser.add_argument('out_dir', help='dir to save analysis figures')
    parser.add_argument('--ann', required=True,
                        help='annotation json file path')
    parser.add_argument('--types', type=str, nargs='+', default=['bbox'])
    parser.add_argument('--areas', type=int, nargs='+', default=None,
                        help='3 area cutoffs (small/medium/large)')
    parser.add_argument('--nproc', type=int, default=4)
    args = parser.parse_args()
    analyze_results(args.result, args.ann, args.types, args.out_dir,
                    areas=args.areas, nproc=args.nproc)


if __name__ == '__main__':
    main()
