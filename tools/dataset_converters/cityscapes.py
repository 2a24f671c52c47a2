"""Convert Cityscapes gtFine annotations to the COCO json the
CityscapesDataset adapter consumes (reference:
tools/dataset_converters/cityscapes.py — rewritten on the framework's
own RLE codec, no cityscapesscripts/pycocotools dependency).

Usage:
  python tools/dataset_converters/cityscapes.py data/cityscapes \
      --out-dir data/cityscapes/annotations
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)),
                              '..', '..'))
import argparse
import glob
import json
import os

import numpy as np

from swindet_tpu.core.masks import mask_to_rle

# The 8 'hasInstances and not ignoreInEval' classes of
# cityscapesscripts.helpers.labels, by raw label id.
INSTANCE_CLASSES = {
    24: 'person', 25: 'rider', 26: 'car', 27: 'truck',
    28: 'bus', 31: 'train', 32: 'motorcycle', 33: 'bicycle',
}


def _imread(path):
    import cv2
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    return img


def load_img_info(img_file, inst_file, segm_file, img_dir):
    inst_img = _imread(inst_file)
    anns = []
    for inst_id in np.unique(inst_img[inst_img >= 24]):
        label_id = inst_id // 1000 if inst_id >= 1000 else inst_id
        if int(label_id) not in INSTANCE_CLASSES:
            continue
        mask = np.asarray(inst_img == inst_id, np.uint8)
        rle = dict(mask_to_rle(mask))
        if isinstance(rle.get('counts'), bytes):
            rle['counts'] = rle['counts'].decode('ascii')
        ys, xs = np.nonzero(mask)
        bbox = [float(xs.min()), float(ys.min()),
                float(xs.max() - xs.min() + 1),
                float(ys.max() - ys.min() + 1)]
        anns.append(dict(
            iscrowd=int(inst_id < 1000),
            category_id=int(label_id),
            bbox=bbox,
            area=float(mask.sum()),
            segmentation=rle))
    h, w = inst_img.shape[:2]
    return dict(
        file_name=os.path.relpath(img_file, img_dir),
        height=int(h), width=int(w),
        segm_file=os.path.relpath(segm_file, img_dir)), anns


def convert(img_dir, gt_dir, out_file):
    suffix = 'leftImg8bit.png'
    images, annotations = [], []
    img_id = ann_id = 0
    files = sorted(glob.glob(os.path.join(img_dir, '**/*.png'),
                             recursive=True))
    for img_file in files:
        if not img_file.endswith(suffix):
            continue
        stem = img_file[len(img_dir):-len(suffix)]
        inst_file = gt_dir + stem + 'gtFine_instanceIds.png'
        segm_file = gt_dir + stem + 'gtFine_labelIds.png'
        info, anns = load_img_info(img_file, inst_file, segm_file,
                                   img_dir)
        info['id'] = img_id
        images.append(info)
        for a in anns:
            a['id'] = ann_id
            a['image_id'] = img_id
            ann_id += 1
            annotations.append(a)
        img_id += 1
    cats = [dict(id=cid, name=name)
            for cid, name in sorted(INSTANCE_CLASSES.items())]
    out = dict(images=images, annotations=annotations, categories=cats)
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    with open(out_file, 'w') as f:
        json.dump(out, f)
    print(f'{out_file}: {len(images)} images, '
          f'{len(annotations)} instances')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('cityscapes_path')
    p.add_argument('--img-dir', default='leftImg8bit')
    p.add_argument('--gt-dir', default='gtFine')
    p.add_argument('--out-dir', default='annotations')
    args = p.parse_args()
    root = args.cityscapes_path
    out_dir = (args.out_dir if os.path.isabs(args.out_dir)
               else os.path.join(root, args.out_dir))
    for split, out in [
            ('train', 'instancesonly_filtered_gtFine_train.json'),
            ('val', 'instancesonly_filtered_gtFine_val.json'),
            ('test', 'instancesonly_filtered_gtFine_test.json')]:
        img_dir = os.path.join(root, args.img_dir, split)
        gt_dir = os.path.join(root, args.gt_dir, split)
        if not os.path.isdir(img_dir):
            continue
        convert(img_dir, gt_dir, os.path.join(out_dir, out))


if __name__ == '__main__':
    main()
