"""CocoDataset + native COCOeval tests with a fake COCO json fixture
(reference test model: tests/test_data/test_datasets/test_common.py:20
_create_dummy_coco_json)."""
import json
import os.path as osp

import numpy as np
import pytest

from swindet_tpu.datasets import CocoDataset, build_dataset


def _dummy_coco_json(path, img_dir):
    import cv2
    images, annotations = [], []
    rs = np.random.RandomState(0)
    ann_id = 1
    for img_id in range(1, 4):
        w, h = 64, 48
        fname = f'img{img_id}.jpg'
        cv2.imwrite(osp.join(img_dir, fname),
                    rs.randint(0, 255, (h, w, 3), np.uint8))
        images.append(dict(id=img_id, file_name=fname,
                           width=w, height=h))
        for j in range(2):
            x, y, bw, bh = 5 + 20 * j, 5 + 10 * j, 15, 15
            annotations.append(dict(
                id=ann_id, image_id=img_id, category_id=1,
                bbox=[x, y, bw, bh], area=bw * bh, iscrowd=0,
                segmentation=[[x, y, x + bw, y, x + bw, y + bh,
                               x, y + bh]]))
            ann_id += 1
    data = dict(images=images, annotations=annotations,
                categories=[dict(id=1, name='person'),
                            dict(id=2, name='bicycle')])
    with open(path, 'w') as f:
        json.dump(data, f)
    return data


@pytest.fixture
def coco_ann(tmp_path):
    p = str(tmp_path / 'ann.json')
    _dummy_coco_json(p, str(tmp_path))
    return p, str(tmp_path)


TRAIN_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='Resize', img_scale=(32, 48), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.0),
    dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True),
    dict(type='Pad', size_divisor=32),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels',
                               'gt_masks']),
]


def test_coco_dataset_load(coco_ann):
    ann, prefix = coco_ann
    ds = CocoDataset(ann_file=ann, pipeline=TRAIN_PIPELINE,
                     classes=('person', 'bicycle'), img_prefix=prefix)
    assert len(ds) == 3
    out = ds[0]
    assert out['img'].ndim == 3
    assert out['gt_bboxes'].shape[1] == 4
    assert out['gt_masks'].shape[0] == out['gt_bboxes'].shape[0]
    assert out['gt_labels'].dtype == np.int64


def test_coco_evaluate_perfect_predictions(coco_ann):
    """Feeding the GT back as detections must give mAP = 1.0."""
    ann, prefix = coco_ann
    ds = CocoDataset(ann_file=ann, pipeline=TRAIN_PIPELINE,
                     classes=('person', 'bicycle'), img_prefix=prefix)
    results = []
    for i in range(len(ds)):
        info = ds.get_ann_info(i)
        dets = np.hstack([info['bboxes'],
                          np.ones((len(info['bboxes']), 1), np.float32)])
        results.append([dets, np.zeros((0, 5), np.float32)])
    out = ds.evaluate(results, metric='bbox')
    assert out['bbox_mAP'] == pytest.approx(1.0, abs=1e-4)


def test_coco_evaluate_wrong_predictions(coco_ann):
    ann, prefix = coco_ann
    ds = CocoDataset(ann_file=ann, pipeline=TRAIN_PIPELINE,
                     classes=('person', 'bicycle'), img_prefix=prefix)
    results = []
    for i in range(len(ds)):
        # boxes far away from any GT
        dets = np.array([[40, 40, 45, 45, 0.9]], np.float32)
        results.append([dets, np.zeros((0, 5), np.float32)])
    out = ds.evaluate(results, metric='bbox')
    assert out['bbox_mAP'] == pytest.approx(0.0, abs=1e-4)


def test_coco_evaluate_segm(coco_ann):
    from swindet_tpu.core import rle as maskUtils
    ann, prefix = coco_ann
    ds = CocoDataset(ann_file=ann, pipeline=TRAIN_PIPELINE,
                     classes=('person', 'bicycle'), img_prefix=prefix)
    results = []
    for i in range(len(ds)):
        info = ds.get_ann_info(i)
        dets = np.hstack([info['bboxes'],
                          np.ones((len(info['bboxes']), 1), np.float32)])
        masks = []
        for b in info['bboxes']:
            m = np.zeros((48, 64), np.uint8)
            x1, y1, x2, y2 = b.astype(int)
            m[y1:y2, x1:x2] = 1
            masks.append(m)
        results.append(([dets, np.zeros((0, 5), np.float32)],
                        [masks, []]))
    out = ds.evaluate(results, metric=['bbox', 'segm'])
    assert out['bbox_mAP'] == pytest.approx(1.0, abs=1e-4)
    assert out['segm_mAP'] > 0.5


def test_half_correct_ap(coco_ann):
    """1 of 2 GTs detected per image at perfect IoU → AP ~ 0.5."""
    ann, prefix = coco_ann
    ds = CocoDataset(ann_file=ann, pipeline=TRAIN_PIPELINE,
                     classes=('person', 'bicycle'), img_prefix=prefix)
    results = []
    for i in range(len(ds)):
        info = ds.get_ann_info(i)
        dets = np.hstack([info['bboxes'][:1],
                          np.ones((1, 1), np.float32)])
        results.append([dets, np.zeros((0, 5), np.float32)])
    out = ds.evaluate(results, metric='bbox')
    assert out['bbox_mAP'] == pytest.approx(0.5, abs=0.01)


def test_repeat_dataset(coco_ann):
    ann, prefix = coco_ann
    cfg = dict(type='RepeatDataset', times=3,
               dataset=dict(type='CocoDataset', ann_file=ann,
                            pipeline=TRAIN_PIPELINE,
                            classes=('person', 'bicycle'),
                            img_prefix=prefix))
    ds = build_dataset(cfg)
    assert len(ds) == 9
