"""Visualize pipeline outputs (reference: tools/misc/browse_dataset.py)."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), '..', '..'))
import argparse
import os

import numpy as np

from swindet_tpu.datasets import build_dataset
from swindet_tpu.utils import Config


def main():
    p = argparse.ArgumentParser(description='Browse the train pipeline')
    p.add_argument('config')
    p.add_argument('--output-dir', default='browse_out')
    p.add_argument('--number', type=int, default=10)
    args = p.parse_args()
    import cv2
    cfg = Config.fromfile(args.config)
    ds = build_dataset(dict(cfg.data.train))
    os.makedirs(args.output_dir, exist_ok=True)
    norm = None
    for t in cfg.data.train.pipeline:
        if t['type'] == 'Normalize':
            norm = t
    for i in range(min(args.number, len(ds))):
        s = ds[i]
        img = np.asarray(s['img'], np.float32)
        if norm is not None:
            img = img * np.asarray(norm['std']) + np.asarray(norm['mean'])
            if norm.get('to_rgb'):
                img = img[..., ::-1]
        img = np.clip(img, 0, 255).astype(np.uint8).copy()
        for b in np.asarray(s.get('gt_bboxes', np.zeros((0, 4)))):
            x1, y1, x2, y2 = b.astype(int)
            cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 2)
        out = _osp.join(args.output_dir, f'{i}.jpg')
        cv2.imwrite(out, img)
        print('wrote', out)


if __name__ == '__main__':
    main()
