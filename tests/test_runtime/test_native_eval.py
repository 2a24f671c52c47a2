"""Native batched eval loader (SWINDET_NATIVE_IMAGE=1): the
single_gpu_test fast path must (a) trigger only on the canonical
single-scale keep-ratio pipeline, and (b) produce the same detections
as the per-image Python pipeline (reference counterpart:
mmdet/apis/test.py:16 single_gpu_test over DataLoader fork workers)."""
import json
import os
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swindet_tpu import native
from swindet_tpu.datasets import CocoDataset
from swindet_tpu.models import build_detector
from swindet_tpu.utils import jit_init
from swindet_tpu.apis.inference import DetectorHandle
from swindet_tpu.apis.test import (single_gpu_test, _native_eval_plan)

from tests.test_models.test_forward import tiny_maskrcnn_cfg

pytestmark = pytest.mark.skipif(
    not native.image_available(), reason='native toolchain unavailable')


def _fixture(tmp_path):
    """3 PNG images (lossless decode → bit-identical to cv2) already AT
    the target scale, so Resize is the identity and both paths see the
    same pixels."""
    import cv2
    images = []
    rs = np.random.RandomState(3)
    for img_id, (h, w) in enumerate([(48, 64), (48, 64), (64, 48)], 1):
        fname = f'img{img_id}.png'
        cv2.imwrite(osp.join(str(tmp_path), fname),
                    rs.randint(0, 255, (h, w, 3), np.uint8))
        images.append(dict(id=img_id, file_name=fname,
                           width=w, height=h))
    data = dict(images=images, annotations=[],
                categories=[dict(id=1, name='person'),
                            dict(id=2, name='bicycle')])
    p = str(tmp_path / 'ann.json')
    with open(p, 'w') as f:
        json.dump(data, f)
    return p, str(tmp_path)


TEST_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug', img_scale=(64, 48), flip=False,
         transforms=[
             dict(type='Resize', keep_ratio=True),
             dict(type='RandomFlip'),
             dict(type='Normalize', mean=[10., 20., 30.],
                  std=[58., 57., 59.], to_rgb=True),
             dict(type='Pad', size_divisor=32),
             dict(type='ImageToTensor', keys=['img']),
             dict(type='Collect', keys=['img']),
         ]),
]


class _Cfg(dict):
    __getattr__ = dict.__getitem__


def _make_handle():
    cfg = tiny_maskrcnn_cfg(with_mask=True)
    module = build_detector(cfg)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jit_init(module, {'params': jax.random.PRNGKey(0)},
                         dummy, method='forward_dummy')
    model_cfg = _Cfg(model=_Cfg(test_cfg=_Cfg(
        rcnn=dict(cfg['test_cfg']['rcnn']))))
    return DetectorHandle(model_cfg, module, variables,
                          CLASSES=['a', 'b', 'c', 'd'])


def test_native_plan_detection(tmp_path):
    ann, prefix = _fixture(tmp_path)
    ds = CocoDataset(ann_file=ann, pipeline=TEST_PIPELINE,
                     img_prefix=prefix, test_mode=True)
    os.environ['SWINDET_NATIVE_IMAGE'] = '1'
    try:
        plan = _native_eval_plan(ds)
        assert plan is not None
        assert plan['long'] == 64 and plan['short'] == 48
        assert plan['divisor'] == 32 and plan['to_rgb']
        assert len(plan['paths']) == 3
    finally:
        os.environ.pop('SWINDET_NATIVE_IMAGE', None)
    # off by default
    assert _native_eval_plan(ds) is None
    # TTA pipeline → no plan
    tta = [dict(TEST_PIPELINE[0]), dict(TEST_PIPELINE[1], flip=True)]
    ds_tta = CocoDataset(ann_file=ann, pipeline=tta, img_prefix=prefix,
                         test_mode=True)
    os.environ['SWINDET_NATIVE_IMAGE'] = '1'
    try:
        assert _native_eval_plan(ds_tta) is None
    finally:
        os.environ.pop('SWINDET_NATIVE_IMAGE', None)


def test_native_loader_matches_pipeline(tmp_path):
    """Batch tensors from the native loader == the Python pipeline's
    normalized/padded images (PNG + identity scale → near-exact; the
    only slack is the native bilinear's float weights)."""
    ann, prefix = _fixture(tmp_path)
    ds = CocoDataset(ann_file=ann, pipeline=TEST_PIPELINE,
                     img_prefix=prefix, test_mode=True)
    os.environ['SWINDET_NATIVE_IMAGE'] = '1'
    try:
        plan = _native_eval_plan(ds)
    finally:
        os.environ.pop('SWINDET_NATIVE_IMAGE', None)
    assert plan is not None
    imgs, shapes, scales = native.image_load_batch(
        plan['paths'], (96, 96), (plan['long'], plan['short']),
        plan['mean'], plan['std'], to_rgb=plan['to_rgb'])
    for i in range(3):
        r = ds[i]
        ref_img = r['img'][0]          # normalized + padded
        meta = r['img_metas'][0]
        h, w = meta['img_shape'][:2]
        assert tuple(shapes[i]) == (h, w)
        np.testing.assert_allclose(
            scales[i], meta['scale_factor'][:2], atol=1e-6)
        np.testing.assert_allclose(imgs[i, :h, :w],
                                   ref_img[:h, :w], atol=0.05)
        assert np.all(imgs[i, h:] == 0) and np.all(imgs[i, :, w:] == 0)


def test_native_eval_end_to_end(tmp_path):
    """single_gpu_test with the native plan active returns per-image
    results with the right structure for every image."""
    ann, prefix = _fixture(tmp_path)
    ds = CocoDataset(ann_file=ann, pipeline=TEST_PIPELINE,
                     img_prefix=prefix, test_mode=True)
    handle = _make_handle()
    os.environ['SWINDET_NATIVE_IMAGE'] = '1'
    try:
        fast = single_gpu_test(handle, ds, batch_size=2)
    finally:
        os.environ.pop('SWINDET_NATIVE_IMAGE', None)
    assert len(fast) == 3
    for i, f in enumerate(fast):
        fb, fm = f
        assert len(fb) == 4
        oh, ow = ds.data_infos[i]['height'], ds.data_infos[i]['width']
        for c in range(4):
            assert fb[c].ndim == 2 and fb[c].shape[1] == 5
            assert len(fm[c]) == fb[c].shape[0]
            for m in fm[c]:
                assert m.shape == (oh, ow)
