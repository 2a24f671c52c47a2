"""Sustained loader+train-step overlapped throughput (VERDICT r4 ask
#4): runs the real DetDataLoader (native C++ plan when available) in
its prefetch threads OVERLAPPED with the jitted train step on device,
and reports steady-state img/s — the number that tells you whether a
production host can feed its chips.

Generates a synthetic COCO-on-disk dataset of real JPEGs at mstrain
scale, builds the FLAGSHIP AutoAugment recipe (the exact
configs/swin/mask_rcnn_swin_tiny_..._1x_coco.py:28-57 form), and times
N steps end-to-end: wall time includes loader waits, so
  sustained img/s = min(loader rate, step rate)  (+ overlap wins).

Usage:
  python .dev_scripts/train_sustained.py [--steps 30] [--bs 2]
          [--hw 800 1066] [--no-native] [--python-pipeline]
"""
import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import numpy as np


def make_dataset(root, n_images=64, max_hw=(800, 1066)):
    import cv2
    os.makedirs(root, exist_ok=True)
    ann_path = osp.join(root, 'ann.json')
    if osp.exists(ann_path):
        return ann_path
    rs = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    h, w = max_hw
    for img_id in range(1, n_images + 1):
        fname = f'img{img_id}.jpg'
        img = rs.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(osp.join(root, fname), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        images.append(dict(id=img_id, file_name=fname, width=w,
                           height=h))
        for _ in range(12):
            x = int(rs.randint(0, w - 120))
            y = int(rs.randint(0, h - 120))
            bw = int(rs.randint(30, 110))
            bh = int(rs.randint(30, 110))
            annotations.append(dict(
                id=ann_id, image_id=img_id,
                category_id=int(rs.randint(1, 81)),
                bbox=[x, y, bw, bh], area=bw * bh, iscrowd=0,
                segmentation=[[x, y, x + bw, y, x + bw, y + bh,
                               x, y + bh]]))
            ann_id += 1
    with open(ann_path, 'w') as f:
        json.dump(dict(
            images=images, annotations=annotations,
            categories=[dict(id=c, name=str(c)) for c in range(1, 81)]),
            f)
    return ann_path


FLAGSHIP_AUTOAUG = dict(
    type='AutoAugment',
    policies=[
        [dict(type='Resize',
              img_scale=[(480, 1333), (512, 1333), (544, 1333),
                         (576, 1333), (608, 1333), (640, 1333),
                         (672, 1333), (704, 1333), (736, 1333),
                         (768, 1333), (800, 1333)],
              multiscale_mode='value', keep_ratio=True)],
        [dict(type='Resize', img_scale=[(400, 1333), (500, 1333),
                                        (600, 1333)],
              multiscale_mode='value', keep_ratio=True),
         dict(type='RandomCrop', crop_type='absolute_range',
              crop_size=(384, 600), allow_negative_crop=True),
         dict(type='Resize',
              img_scale=[(480, 1333), (512, 1333), (544, 1333),
                         (576, 1333), (608, 1333), (640, 1333),
                         (672, 1333), (704, 1333), (736, 1333),
                         (768, 1333), (800, 1333)],
              multiscale_mode='value', override=True,
              keep_ratio=True)],
    ])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=30)
    ap.add_argument('--bs', type=int, default=2)
    ap.add_argument('--hw', type=int, nargs=2, default=(800, 1066))
    ap.add_argument('--workers', type=int, default=0,
                    help='0 = os.cpu_count()')
    ap.add_argument('--no-native', action='store_true',
                    help='force the Python/cv2 pipeline')
    ap.add_argument('--loader-only', action='store_true',
                    help='skip the device step (pure loader rate)')
    ap.add_argument('--data-root', default='/tmp/sustained_coco')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from swindet_tpu.datasets import CocoDataset
    from swindet_tpu.datasets.builder import (DetDataLoader,
                                              derive_native_train_plan)

    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
        FLAGSHIP_AUTOAUG,
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375], to_rgb=True),
        dict(type='Pad', size_divisor=32),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels',
                                   'gt_masks']),
    ]
    ann = make_dataset(args.data_root, max_hw=tuple(args.hw))
    ds = CocoDataset(ann_file=ann, pipeline=pipeline,
                     classes=tuple(str(c) for c in range(1, 81)),
                     img_prefix=args.data_root)
    plan = None
    if not args.no_native:
        plan = derive_native_train_plan(ds)
        if plan is None:
            print('# native plan NOT derived — python pipeline',
                  file=sys.stderr)
    workers = args.workers or (os.cpu_count() or 1)
    loader = DetDataLoader(
        ds, batch_size=args.bs, canvas_long=1344, canvas_short=832,
        max_gts=100, with_mask=True, shuffle=True,
        num_workers=workers, prefetch=4, native_plan=plan)

    if args.loader_only:
        n_img, t0 = 0, None
        for epoch in range(100):
            loader.set_epoch(epoch)
            for batch in loader:
                if t0 is None:
                    t0 = time.perf_counter()   # first batch = warmup
                else:
                    n_img += batch['img'].shape[0]
                if n_img >= args.steps * args.bs:
                    dt = time.perf_counter() - t0
                    print(json.dumps(dict(
                        mode='loader_only',
                        native=plan is not None, workers=workers,
                        img_s=round(n_img / dt, 2))))
                    return
        return

    # ---- device step
    from __graft_entry__ import _tiny_swin_t_cfg
    from swindet_tpu.models import build_detector
    from swindet_tpu.engine import (TrainState, build_optimizer,
                                    jit_train_step, make_train_step)
    from swindet_tpu.parallel import make_mesh, replicate, shard_batch
    from swindet_tpu.utils import jit_init
    import optax

    cfg = _tiny_swin_t_cfg()
    on_tpu = jax.devices()[0].platform == 'tpu'
    cfg['dtype'] = jnp.bfloat16 if on_tpu else jnp.float32
    model = build_detector(cfg)
    variables = jit_init(
        model, {'params': jax.random.PRNGKey(0),
                'sampling': jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3)), method='forward_dummy')
    tx = build_optimizer(variables['params'],
                         dict(type='AdamW', lr=1e-4, weight_decay=0.05),
                         optax.constant_schedule(1e-4))
    state = TrainState.create(variables['params'], tx)
    mesh = make_mesh(n_devices=1)
    step = jit_train_step(make_train_step(model, tx), mesh)
    state = replicate(mesh, state)
    key = jax.random.PRNGKey(7)

    def device_batch(b):
        keep = ('img', 'img_shapes', 'pad_shapes', 'gt_bboxes',
                'gt_valid', 'gt_labels', 'gt_masks')
        db = {k: b[k] for k in keep if k in b}
        db['gt_masks'] = db['gt_masks'].astype(np.float32)
        return shard_batch(mesh, db)

    # async dispatch: enqueue step i while the loader prepares i+1 —
    # fence only at the end (in-order device stream)
    n_done, t0, metrics = 0, None, None
    for epoch in range(1000):
        loader.set_epoch(epoch)
        for batch in loader:
            state, metrics = step(state, device_batch(batch), key)
            if t0 is None:
                float(jax.tree.leaves(metrics)[0])   # compile fence
                t0 = time.perf_counter()
            else:
                n_done += batch['img'].shape[0]
            if n_done >= args.steps * args.bs:
                float(jax.tree.leaves(metrics)[0])   # final fence
                dt = time.perf_counter() - t0
                print(json.dumps(dict(
                    mode='sustained', native=plan is not None,
                    workers=workers, steps=args.steps, bs=args.bs,
                    img_s=round(n_done / dt, 2))))
                return


if __name__ == '__main__':
    main()
