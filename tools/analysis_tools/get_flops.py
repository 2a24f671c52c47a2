"""FLOPs/params counter (reference: tools/analysis_tools/get_flops.py —
mmcv flops_counter on forward_dummy; here XLA cost analysis on the jitted
forward, which counts ALL ops, not just convs/FCs)."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), *(['..'] * ('analysis_tools' in _osp.dirname(_osp.abspath(__file__)) and 2 or 1))))
import argparse

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Get model FLOPs and params')
    p.add_argument('config')
    p.add_argument('--shape', type=int, nargs='+', default=[1280, 800])
    p.add_argument('--cfg-options', nargs='+', default=None)
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    from swindet_tpu.models import build_detector
    from swindet_tpu.utils import Config

    args = parse_args()
    if len(args.shape) == 1:
        h = w = args.shape[0]
    else:
        h, w = args.shape
    cfg = Config.fromfile(args.config)
    model = build_detector(dict(cfg.model))

    img = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        img[:, :64, :64], method='forward_dummy')
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(
                       variables['params']))

    def fwd(v, x):
        return model.apply(v, x)  # backbone+neck feature extraction

    lowered = jax.jit(fwd).lower(variables, img)
    cost = lowered.compile().cost_analysis()
    flops = cost.get('flops', 0.0) if cost else 0.0
    print('=' * 30)
    print(f'Input shape: (1, {h}, {w}, 3)')
    print(f'Params: {n_params / 1e6:.2f} M')
    print(f'FLOPs (backbone+neck fwd): {flops / 1e9:.2f} GFLOPs')
    print('=' * 30)


if __name__ == '__main__':
    main()
