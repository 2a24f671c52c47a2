"""HTTP serving tool (tools/deployment/serve.py): ping + a real
prediction round-trip against a tiny detector handle."""
import json
import threading
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp

from swindet_tpu.models import build_detector
from swindet_tpu.utils import jit_init
from swindet_tpu.apis.inference import DetectorHandle

from tests.test_models.test_forward import tiny_maskrcnn_cfg
from tests.test_runtime.test_async import _Cfg


def _make_handle():
    cfg = tiny_maskrcnn_cfg(with_mask=False)
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


def test_serve_roundtrip(tmp_path):
    import cv2
    import sys
    import os.path as osp
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..',
                                'tools', 'deployment'))
    import serve
    from http.server import ThreadingHTTPServer

    handle = _make_handle()
    handler = serve.make_handler(handle, list(handle.CLASSES),
                                 score_thr=0.0)
    srv = ThreadingHTTPServer(('127.0.0.1', 0), handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f'http://127.0.0.1:{port}/ping', timeout=30) as r:
            assert json.loads(r.read()) == {'status': 'ok'}

        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (64, 96, 3)).astype(np.uint8)
        path = str(tmp_path / 'img.jpg')
        cv2.imwrite(path, img)
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/predictions/detector',
            data=open(path, 'rb').read(), method='POST')
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        assert isinstance(out, list)
        for det in out:
            assert set(det) == {'bbox', 'score', 'label', 'class_name'}
            assert det['class_name'] in handle.CLASSES
    finally:
        srv.shutdown()
