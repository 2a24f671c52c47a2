"""Multi-model inference throughput rows (VERDICT r3 ask #6 breadth).

Measures single-chip bf16 inference at the 800x1344 COCO test canvas
with the same structured-input methodology as bench.py, for:

  maskrcnn_swin_t    — the flagship (cross-check vs bench.py)
  cascade_swin_b     — configs/swin/cascade_mask_rcnn_swin_base_...py
  reppoints_swin_t   — RepPoints-moment head on the Swin-T backbone
                       (the BASELINE.md 'RepPoints V2 Swin-T' row has
                       no config in the reference tree)

With --converted (default when /root/reference is importable), weights
come from a reference-init TORCH model passed through the production
.pth converter, so score distributions match what a converted
checkpoint would produce at init (VERDICT r3 ask #6).

Usage: python .dev_scripts/bench_models.py [model ...]
"""
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import numpy as np


def structured_image(h, w, batch=1, seed=0):
    rs = np.random.RandomState(seed)
    raw = rs.randint(0, 256, (batch, h, w, 3)).astype(np.float32)
    for bi in range(batch):
        for _ in range(16):
            y0, x0 = rs.randint(0, h - 64), rs.randint(0, w - 64)
            bh, bw = rs.randint(24, 256), rs.randint(24, 256)
            raw[bi, y0:min(y0 + bh, h), x0:min(x0 + bw, w)] = \
                rs.randint(0, 256, 3)
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    return (raw - mean) / std


def model_cfgs():
    from __graft_entry__ import _tiny_swin_t_cfg
    from swindet_tpu.utils.config import Config
    root = osp.join(osp.dirname(__file__), '..')

    swin_t = _tiny_swin_t_cfg()
    swin_t['test_cfg']['rpn'].update(nms_pre=1000, max_per_img=1000)

    cas = Config.fromfile(osp.join(
        root, 'configs/swin/cascade_mask_rcnn_swin_base_patch4_window7_'
        'mstrain_480-800_giou_4conv1f_adamw_3x_coco.py'))
    cascade_b = dict(cas.model)

    rep = Config.fromfile(osp.join(
        root, 'configs/reppoints/reppoints_moment_r50_fpn_1x_coco.py'))
    reppoints = dict(rep.model)
    # Swin-T backbone (BASELINE.md RepPoints V2 Swin-T row; no config
    # in the reference tree, so the closest in-tree head + Swin-T)
    reppoints['backbone'] = dict(swin_t['backbone'])
    reppoints['neck'] = dict(reppoints['neck'],
                             in_channels=[96, 192, 384, 768])
    return dict(maskrcnn_swin_t=swin_t, cascade_swin_b=cascade_b,
                reppoints_swin_t=reppoints)


def converted_variables(cfg, model, variables):
    """Reference-init torch weights through the production converter."""
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))
    from tests.test_golden import refbridge
    if not refbridge.reference_available():
        return variables, False
    import copy
    import torch
    from swindet_tpu.checkpoint import (convert_torch_state_dict,
                                        default_flatten_hints)
    torch.manual_seed(0)
    ref_cfg = copy.deepcopy(cfg)
    ref_cfg.pop('dtype', None)
    ref_cfg['pretrained'] = None   # no external weights in this env
    ref = refbridge.build_ref_detector(ref_cfg)
    hints = default_flatten_hints(cfg)
    out = dict(variables)
    if 'batch_stats' in variables:
        new_params, new_stats, report = convert_torch_state_dict(
            ref.state_dict(), variables['params'], flatten_hints=hints,
            batch_stats=variables['batch_stats'])
        out['batch_stats'] = new_stats
    else:
        new_params, report = convert_torch_state_dict(
            ref.state_dict(), variables['params'], flatten_hints=hints)
    out['params'] = new_params
    if report['missing'] or report['unexpected']:
        print(f'# converter: {len(report["missing"])} missing / '
              f'{len(report["unexpected"])} unexpected', file=sys.stderr)
    return out, True


def bench_one(name, cfg, use_converted=True):
    import jax
    import jax.numpy as jnp
    from swindet_tpu.models import build_detector
    from swindet_tpu.utils import jit_init

    on_tpu = jax.devices()[0].platform == 'tpu'
    h, w = (800, 1344) if on_tpu else (224, 320)
    iters, warmup = (100, 10) if on_tpu else (3, 1)
    cfg = dict(cfg)
    cfg['dtype'] = jnp.bfloat16 if on_tpu else jnp.float32
    model = build_detector(cfg)
    img = jnp.asarray(structured_image(h, w), jnp.float32)
    variables = jit_init(
        model, {'params': jax.random.PRNGKey(0),
                'sampling': jax.random.PRNGKey(1)},
        img[:, :64, :64], method='forward_dummy')
    converted = False
    if use_converted:
        try:
            variables, converted = converted_variables(cfg, model,
                                                       variables)
        except Exception as e:
            print(f'# converted-weight path unavailable: {e}',
                  file=sys.stderr)
    img_shapes = jnp.asarray([[h, w]], jnp.int32)
    scale_factors = jnp.ones((1, 4), jnp.float32)

    @jax.jit
    def run(variables, img, img_shapes, scale_factors):
        return model.apply(variables, img, img_shapes, scale_factors,
                           method='simple_test')

    def sync(o):
        return float(jnp.sum(o['dets']))

    out = run(variables, img, img_shapes, scale_factors)
    sync(out)
    for _ in range(warmup):
        out = run(variables, img, img_shapes, scale_factors)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(variables, img, img_shapes, scale_factors)
    sync(out)
    dt = time.perf_counter() - t0
    print(json.dumps(dict(model=name, img_s=round(iters / dt, 3),
                          converted_weights=converted,
                          canvas=f'{h}x{w}')))


def main():
    cfgs = model_cfgs()
    wanted = sys.argv[1:] or list(cfgs)
    for name in wanted:
        bench_one(name, cfgs[name])


if __name__ == '__main__':
    main()
