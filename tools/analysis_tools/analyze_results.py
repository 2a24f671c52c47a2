"""Rank eval images by per-image mAP; save the best/worst topk with
GT (green) vs detection (red) overlays (reference:
tools/analysis_tools/analyze_results.py)."""
import argparse
import os
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))

from swindet_tpu.core.eval.mean_ap import eval_map
from swindet_tpu.datasets import build_dataset
from swindet_tpu.utils import Config, DictAction


def bbox_map_eval(det_result, annotation):
    """Mean over IoU thresholds .5:.95 of per-image mAP
    (reference: analyze_results.py:14)."""
    bbox_det_result = (det_result[0] if isinstance(det_result, tuple)
                       else det_result)
    mean_aps = []
    for thr in np.arange(0.5, 1.0, 0.05):
        mean_ap, _ = eval_map([bbox_det_result], [annotation],
                              iou_thr=float(thr), logger='silent')
        mean_aps.append(mean_ap)
    return sum(mean_aps) / len(mean_aps)


def _draw(img, bboxes, color, labels=None, classes=None):
    import cv2
    img = img.copy()
    for i, b in enumerate(bboxes):
        p1, p2 = (int(b[0]), int(b[1])), (int(b[2]), int(b[3]))
        cv2.rectangle(img, p1, p2, color, 1)
        if labels is not None and classes is not None:
            cv2.putText(img, str(classes[int(labels[i])]),
                        (p1[0], max(p1[1] - 2, 8)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.3, color, 1)
    return img


def save_image_gts_results(dataset, results, mAPs, out_dir, score_thr):
    import cv2
    os.makedirs(out_dir, exist_ok=True)
    for index, mAP in mAPs:
        info = dataset.data_infos[index]
        path = osp.join(dataset.img_prefix or '', info['filename'])
        img = cv2.imread(path)
        if img is None:
            continue
        ann = dataset.get_ann_info(index)
        img = _draw(img, ann['bboxes'], (0, 255, 0), ann['labels'],
                    dataset.CLASSES)
        det = (results[index][0] if isinstance(results[index], tuple)
               else results[index])
        for label, dets in enumerate(det):
            keep = dets[:, 4] >= score_thr if len(dets) else []
            img = _draw(img, dets[keep][:, :4], (0, 0, 255),
                        [label] * int(np.sum(keep)), dataset.CLASSES)
        base, ext = osp.splitext(osp.basename(info['filename']))
        cv2.imwrite(osp.join(out_dir, f'{base}_{round(mAP, 3)}{ext}'),
                    img)


def main():
    parser = argparse.ArgumentParser(
        description='Analyze per-image eval results')
    parser.add_argument('config')
    parser.add_argument('prediction_path', help='pkl result path')
    parser.add_argument('show_dir', help='output directory')
    parser.add_argument('--topk', type=int, default=20)
    parser.add_argument('--show-score-thr', type=float, default=0)
    parser.add_argument('--cfg-options', nargs='+', action=DictAction)
    args = parser.parse_args()

    cfg = Config.fromfile(args.config)
    if args.cfg_options is not None:
        cfg.merge_from_dict(args.cfg_options)
    cfg.data.test['test_mode'] = True
    dataset = build_dataset(dict(cfg.data.test))
    with open(args.prediction_path, 'rb') as f:
        outputs = pickle.load(f)

    mAPs = {}
    for i, result in enumerate(outputs):
        ann = dataset.get_ann_info(i)
        annotation = dict(bboxes=ann['bboxes'], labels=ann['labels'],
                          bboxes_ignore=ann.get('bboxes_ignore'),
                          labels_ignore=None)
        mAPs[i] = bbox_map_eval(result, annotation)

    ranked = sorted(mAPs.items(), key=lambda kv: kv[1])
    topk = min(args.topk, len(ranked) // 2 or 1)
    worst = ranked[:topk]
    best = ranked[-topk:]
    print('worst:', [(i, round(m, 3)) for i, m in worst])
    print('best :', [(i, round(m, 3)) for i, m in best])
    save_image_gts_results(dataset, outputs, best,
                           osp.join(args.show_dir, 'good'),
                           args.show_score_thr)
    save_image_gts_results(dataset, outputs, worst,
                           osp.join(args.show_dir, 'bad'),
                           args.show_score_thr)


if __name__ == '__main__':
    main()
