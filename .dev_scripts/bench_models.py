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


# Published reference FLOPs (BASELINE.md rows; GFLOPs at the COCO test
# scale) anchor the A100-equivalent throughput for each breadth row:
# a100_equiv = 15.3 img/s (flagship A100 anchor) x 267G / model_GF.
# Models without a published number are anchored by the XLA-measured
# flop ratio against the flagship compiled in the same run.
PUBLISHED_GF = {'maskrcnn_swin_t': 267.0, 'cascade_swin_b': 982.0}
A100_FLAGSHIP_IPS = 15.3
FLAGSHIP_GF = 267.0


def _xla_gflops(compiled):
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get('flops', 0.0)) / 1e9
    except Exception:
        return 0.0


def bench_one(name, cfg, use_converted=True, iters=None):
    import jax
    import jax.numpy as jnp
    from swindet_tpu.models import build_detector
    from swindet_tpu.utils import jit_init

    on_tpu = jax.devices()[0].platform == 'tpu'
    h, w = (800, 1344) if on_tpu else (224, 320)
    if iters is None:
        iters = 100 if on_tpu else 3
    warmup = 10 if on_tpu else 1
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

    def run_fn(variables, img, img_shapes, scale_factors):
        return model.apply(variables, img, img_shapes, scale_factors,
                           method='simple_test')

    compiled = jax.jit(run_fn).lower(
        variables, img, img_shapes, scale_factors).compile()
    run = compiled

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
    row = dict(model=name, img_s=round(iters / dt, 3),
               converted_weights=converted, canvas=f'{h}x{w}',
               xla_gflops=round(_xla_gflops(compiled), 1))
    return row


def finalize_rows(rows):
    """Attach FLOPs-anchored A100-equivalent baselines + vs_baseline
    (VERDICT r4 ask #8: make breadth rows pass/fail numbers)."""
    flag = next((r for r in rows if r['model'] in PUBLISHED_GF
                 and r['model'] == 'maskrcnn_swin_t'), None)
    for r in rows:
        gf = PUBLISHED_GF.get(r['model'])
        if gf is None and flag is not None and flag['xla_gflops'] > 0 \
                and r['xla_gflops'] > 0:
            # anchor by measured flop ratio vs the flagship in this run
            gf = FLAGSHIP_GF * r['xla_gflops'] / flag['xla_gflops']
        if gf:
            a100 = A100_FLAGSHIP_IPS * FLAGSHIP_GF / gf
            r['a100_equiv_img_s'] = round(a100, 2)
            r['vs_baseline'] = round(r['img_s'] / a100, 3)
    return rows


def main():
    cfgs = model_cfgs()
    wanted = sys.argv[1:] or list(cfgs)
    rows = [bench_one(name, cfgs[name]) for name in wanted]
    for row in finalize_rows(rows):
        print(json.dumps(row))


if __name__ == '__main__':
    main()
