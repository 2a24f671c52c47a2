"""VOC XML dataset test with a synthetic VOCdevkit mini-tree (reference
fixture model: tests/data/VOCdevkit)."""
import os
import os.path as osp

import numpy as np
import pytest

from swindet_tpu.datasets import VOCDataset


@pytest.fixture
def voc_root(tmp_path):
    import cv2
    root = tmp_path / 'VOC2007'
    (root / 'JPEGImages').mkdir(parents=True)
    (root / 'Annotations').mkdir()
    (root / 'ImageSets' / 'Main').mkdir(parents=True)
    rs = np.random.RandomState(0)
    ids = []
    for i in range(3):
        img_id = f'00000{i}'
        ids.append(img_id)
        cv2.imwrite(str(root / 'JPEGImages' / f'{img_id}.jpg'),
                    rs.randint(0, 255, (60, 80, 3), np.uint8))
        xml = f'''<annotation>
  <size><width>80</width><height>60</height><depth>3</depth></size>
  <object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>10</xmin><ymin>10</ymin><xmax>40</xmax><ymax>40</ymax></bndbox>
  </object>
  <object><name>person</name><difficult>1</difficult>
    <bndbox><xmin>5</xmin><ymin>5</ymin><xmax>20</xmax><ymax>25</ymax></bndbox>
  </object>
</annotation>'''
        (root / 'Annotations' / f'{img_id}.xml').write_text(xml)
    (root / 'ImageSets' / 'Main' / 'test.txt').write_text(
        '\n'.join(ids))
    return str(root)


PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(80, 60), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.0),
    dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True),
    dict(type='Pad', size_divisor=32),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
]


def test_voc_load_and_eval(voc_root):
    ds = VOCDataset(ann_file=osp.join(voc_root, 'ImageSets/Main/test.txt'),
                    pipeline=PIPELINE, img_prefix=voc_root)
    assert len(ds) == 3
    ann = ds.get_ann_info(0)
    assert ann['bboxes'].shape == (1, 4)       # difficult → ignore
    assert ann['bboxes_ignore'].shape == (1, 4)
    s = ds[0]
    assert s['gt_labels'][0] == ds.CLASSES.index('dog')

    # perfect predictions → mAP 1.0
    results = []
    for i in range(len(ds)):
        dets = [np.zeros((0, 5), np.float32) for _ in ds.CLASSES]
        a = ds.get_ann_info(i)
        dets[ds.CLASSES.index('dog')] = np.hstack(
            [a['bboxes'], np.ones((1, 1), np.float32)])
        results.append(dets)
    out = ds.evaluate(results)
    assert out['mAP'] == pytest.approx(1.0, abs=1e-4)
