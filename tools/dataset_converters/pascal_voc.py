"""Convert Pascal VOC XML annotations to COCO json (reference:
tools/dataset_converters/pascal_voc.py). The XMLDataset adapter reads
XMLs directly; this converter exists for pipelines standardised on
COCO json (e.g. coco_error_analysis over VOC results).

Usage:
  python tools/dataset_converters/pascal_voc.py data/VOCdevkit \
      --out-dir data/VOCdevkit/annotations
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)),
                              '..', '..'))
import argparse
import json
import os
import xml.etree.ElementTree as ET

from swindet_tpu.core.eval.class_names import get_classes


def parse_split(devkit, year, split, out_file):
    classes = get_classes('voc')
    cat_ids = {name: i + 1 for i, name in enumerate(classes)}
    list_file = os.path.join(devkit, f'VOC{year}',
                             'ImageSets/Main', f'{split}.txt')
    if not os.path.isfile(list_file):
        return False
    with open(list_file) as f:
        ids = [line.strip().split()[0] for line in f if line.strip()]
    images, annotations = [], []
    ann_id = 0
    for img_id, stem in enumerate(ids):
        xml_path = os.path.join(devkit, f'VOC{year}', 'Annotations',
                                f'{stem}.xml')
        root = ET.parse(xml_path).getroot()
        size = root.find('size')
        w = int(size.find('width').text)
        h = int(size.find('height').text)
        images.append(dict(
            id=img_id, file_name=f'JPEGImages/{stem}.jpg',
            height=h, width=w))
        for obj in root.findall('object'):
            name = obj.find('name').text
            if name not in cat_ids:
                continue
            box = obj.find('bndbox')
            x1 = float(box.find('xmin').text)
            y1 = float(box.find('ymin').text)
            x2 = float(box.find('xmax').text)
            y2 = float(box.find('ymax').text)
            diff = obj.find('difficult')
            annotations.append(dict(
                id=ann_id, image_id=img_id,
                category_id=cat_ids[name],
                bbox=[x1, y1, x2 - x1, y2 - y1],
                area=(x2 - x1) * (y2 - y1),
                iscrowd=0,
                ignore=int(diff.text) if diff is not None else 0))
            ann_id += 1
    cats = [dict(id=i, name=n) for n, i in cat_ids.items()]
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    with open(out_file, 'w') as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=cats), f)
    print(f'{out_file}: {len(images)} images, '
          f'{len(annotations)} boxes')
    return True


def main():
    p = argparse.ArgumentParser()
    p.add_argument('devkit_path')
    p.add_argument('--out-dir', default='annotations')
    args = p.parse_args()
    out_dir = (args.out_dir if os.path.isabs(args.out_dir)
               else os.path.join(args.devkit_path, args.out_dir))
    for year in ('2007', '2012'):
        for split in ('trainval', 'train', 'val', 'test'):
            parse_split(args.devkit_path, year, split,
                        os.path.join(out_dir,
                                     f'voc{year[2:]}_{split}.json'))


if __name__ == '__main__':
    main()
