"""async_inference_detector: concurrent requests produce the same
results as the sync path (reference: apis/inference.py:155,
tests/test_async.py)."""
import asyncio

import numpy as np
import jax
import jax.numpy as jnp

from swindet_tpu.models import build_detector
from swindet_tpu.utils import jit_init
from swindet_tpu.apis.inference import (DetectorHandle,
                                        async_inference_detector,
                                        inference_detector)

from tests.test_models.test_forward import tiny_maskrcnn_cfg


class _Cfg(dict):
    __getattr__ = dict.__getitem__


def _make_handle():
    cfg = tiny_maskrcnn_cfg(with_mask=True)
    module = build_detector(cfg)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jit_init(module, {'params': jax.random.PRNGKey(0)}, dummy,
                         method='forward_dummy')
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='Normalize', mean=[0., 0., 0.], std=[1., 1., 1.],
             to_rgb=False),
        dict(type='Pad', size_divisor=32),
    ]
    model_cfg = _Cfg(
        model=_Cfg(test_cfg=_Cfg(rcnn=dict(cfg['test_cfg']['rcnn']))),
        data=_Cfg(test=_Cfg(pipeline=pipeline)))
    return DetectorHandle(model_cfg, module, variables,
                          CLASSES=['a', 'b', 'c', 'd'])


def test_async_matches_sync():
    handle = _make_handle()
    rng = np.random.RandomState(0)
    im1 = rng.randn(64, 96, 3).astype(np.float32)
    im2 = rng.randn(64, 96, 3).astype(np.float32)

    sync1 = inference_detector(handle, im1)
    sync2 = inference_detector(handle, im2)

    async def gather():
        return await asyncio.gather(
            async_inference_detector(handle, im1),
            async_inference_detector(handle, im2))

    got1, got2 = asyncio.run(gather())
    for got, ref in ((got1, sync1), (got2, sync2)):
        gb, gm = got
        rb, rm = ref
        assert len(gb) == len(rb) == 4
        for a, b in zip(gb, rb):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
