"""LVIS / Cityscapes / WIDER-Face adapter tests on synthetic fixtures
(reference test model: tests/test_data/test_datasets/test_common.py
_create_dummy_coco_json)."""
import json
import os
import os.path as osp

import numpy as np
import pytest

from swindet_tpu.datasets import (CityscapesDataset, LVISV1Dataset,
                                  WIDERFaceDataset, build_dataset)

PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
]


def _img(tmp_path, name, w=64, h=48):
    import cv2
    cv2.imwrite(str(tmp_path / name),
                np.random.RandomState(0).randint(0, 255, (h, w, 3),
                                                 np.uint8))


def _lvis_json(tmp_path):
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, 4):
        fname = f'train2017/img{img_id}.jpg'
        os.makedirs(tmp_path / 'train2017', exist_ok=True)
        _img(tmp_path, fname)
        images.append(dict(
            id=img_id, width=64, height=48,
            coco_url=f'http://images.cocodataset.org/{fname}',
            neg_category_ids=[3] if img_id == 1 else [],
            not_exhaustive_category_ids=[]))
        for j in range(2):
            x, y = 5 + 20 * j, 5 + 10 * j
            annotations.append(dict(
                id=ann_id, image_id=img_id, category_id=1 + j,
                bbox=[x, y, 15, 15], area=225,
                segmentation=[[x, y, x + 15, y, x + 15, y + 15]]))
            ann_id += 1
    cats = [dict(id=1, name='aerosol_can', frequency='c'),
            dict(id=2, name='air_conditioner', frequency='f'),
            dict(id=3, name='airplane', frequency='r')]
    p = tmp_path / 'lvis.json'
    json.dump(dict(images=images, annotations=annotations,
                   categories=cats), open(p, 'w'))
    return str(p)


def test_lvis_dataset_and_eval(tmp_path):
    ann = _lvis_json(tmp_path)
    ds = LVISV1Dataset(ann_file=ann, img_prefix=str(tmp_path) + '/',
                       pipeline=PIPELINE)
    assert len(ds) == 3
    assert len(ds.CLASSES) == 3
    # coco_url → filename
    assert ds.data_infos[0]['filename'] == 'train2017/img1.jpg'
    r = ds[0]
    assert r['gt_bboxes'].shape == (2, 4)

    # perfect predictions → AP 1 on annotated bands
    results = []
    for i in range(3):
        info = ds.get_ann_info(i)
        per_class = [np.zeros((0, 5), np.float32) for _ in range(3)]
        for b, l in zip(info['bboxes'], info['labels']):
            per_class[l] = np.vstack(
                [per_class[l], np.concatenate([b, [0.9]])[None]])
        results.append(per_class)
    metrics = ds.evaluate(results, metric='bbox')
    assert metrics['bbox_AP'] == pytest.approx(1.0)
    assert metrics['bbox_APc'] == pytest.approx(1.0)
    assert metrics['bbox_APf'] == pytest.approx(1.0)
    # rare class has no gt anywhere → nan/-1 band excluded
    assert 'bbox_APr' in metrics

    # federated protocol: detections for a category NOT in any image's
    # pos/neg sets must not hurt AP (they are ignored, not FPs)...
    results_extra = [
        [r[0], r[1], np.array([[1, 1, 20, 20, 0.99]], np.float32)]
        for r in results]
    # ...except image 1, which lists cat 3 as negative → counted FP
    m2 = ds.evaluate(results_extra, metric='bbox')
    assert m2['bbox_AP'] <= metrics['bbox_AP'] + 1e-6
    # cat-3 dets on images 2/3 (unverified) are ignored: only the
    # neg-listed image 1 FP can lower APr from its no-gt state
    assert m2['bbox_APc'] == pytest.approx(1.0)


def _cityscapes_json(tmp_path):
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, 4):
        fname = f'img{img_id}.jpg'
        _img(tmp_path, fname)
        images.append(dict(id=img_id, file_name=fname, width=64,
                           height=48, segm_file=f'img{img_id}_seg.png'))
        iscrowd = 1 if img_id == 3 else 0   # image 3 = all crowd
        annotations.append(dict(
            id=ann_id, image_id=img_id, category_id=1,
            bbox=[5, 5, 15, 15], area=225, iscrowd=iscrowd,
            segmentation=[[5, 5, 20, 5, 20, 20]]))
        ann_id += 1
    cats = [dict(id=i + 1, name=n)
            for i, n in enumerate(CityscapesDataset.CLASSES)]
    p = tmp_path / 'cs.json'
    json.dump(dict(images=images, annotations=annotations,
                   categories=cats), open(p, 'w'))
    return str(p)


def test_cityscapes_dataset(tmp_path):
    ann = _cityscapes_json(tmp_path)
    ds = CityscapesDataset(ann_file=ann, img_prefix=str(tmp_path) + '/',
                           pipeline=PIPELINE, filter_empty_gt=True)
    # image 3 (all iscrowd) filtered out
    assert len(ds) == 2
    ann0 = ds.get_ann_info(0)
    assert ann0['seg_map'] == 'img1_seg.png'
    r = ds[0]
    assert r['gt_bboxes'].shape[0] == 1

    results = []
    for i in range(2):
        info = ds.get_ann_info(i)
        per_class = [np.zeros((0, 5), np.float32) for _ in range(8)]
        for b, l in zip(info['bboxes'], info['labels']):
            per_class[l] = np.vstack(
                [per_class[l], np.concatenate([b, [0.9]])[None]])
        results.append(per_class)
    metrics = ds.evaluate(results, metric='bbox')
    assert metrics['bbox_mAP'] == pytest.approx(1.0)
    with pytest.raises(NotImplementedError):
        ds.evaluate(results, metric='cityscapes')

    # submission txt dump
    files = ds.results2txt(results, str(tmp_path / 'sub_'))
    assert len(files) == 2 and osp.exists(files[0])


def test_wider_face_dataset(tmp_path):
    os.makedirs(tmp_path / 'Annotations', exist_ok=True)
    os.makedirs(tmp_path / '0--Parade', exist_ok=True)
    with open(tmp_path / 'index.txt', 'w') as f:
        f.write('parade_1\n')
    xml = """<annotation><folder>0--Parade</folder>
<size><width>64</width><height>48</height></size>
<object><name>face</name><difficult>0</difficult>
<bndbox><xmin>10</xmin><ymin>10</ymin><xmax>30</xmax><ymax>30</ymax>
</bndbox></object></annotation>"""
    with open(tmp_path / 'Annotations' / 'parade_1.xml', 'w') as f:
        f.write(xml)
    _img(tmp_path, '0--Parade/parade_1.jpg')
    ds = WIDERFaceDataset(ann_file=str(tmp_path / 'index.txt'),
                          img_prefix=str(tmp_path) + '/',
                          pipeline=PIPELINE)
    assert len(ds) == 1
    assert ds.data_infos[0]['filename'] == '0--Parade/parade_1.jpg'
    info = ds.get_ann_info(0)
    np.testing.assert_allclose(info['bboxes'],
                               [[10, 10, 30, 30]], atol=1.1)
    r = ds[0]
    assert r['img'].shape == (48, 64, 3)


def test_build_from_registry(tmp_path):
    ann = _lvis_json(tmp_path)
    ds = build_dataset(dict(type='LVISV1Dataset', ann_file=ann,
                            img_prefix=str(tmp_path) + '/',
                            pipeline=PIPELINE, test_mode=True))
    assert len(ds) == 3
