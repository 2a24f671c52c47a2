"""Batch regression harness over the config zoo (reference:
.dev_scripts/batch_test.py — theirs runs checkpoints against full COCO;
ours smoke-builds every leaf config and runs a tiny forward_train +
simple_test on synthetic data, reporting one row per config).

Usage: python .dev_scripts/batch_smoke.py [--filter swin]
"""
import argparse
import glob
import os.path as osp
import sys
import time
import traceback

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import numpy as np


def smoke_one(cfg_path):
    import jax
    import jax.numpy as jnp
    from swindet_tpu.models import build_detector
    from swindet_tpu.utils import Config
    cfg = Config.fromfile(cfg_path)
    mc = dict(cfg.model)
    # shrink to smoke scale where the knobs exist
    model = build_detector(mc)
    img = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        img, method='forward_dummy')
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        variables['params']))
    shapes = jnp.asarray([[128, 128]], jnp.int32)
    out = model.apply(variables, img, shapes,
                      jnp.ones((1, 4), jnp.float32),
                      method='simple_test')
    assert np.all(np.isfinite(np.asarray(out['dets'], np.float32)))
    return n_params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--filter', default='',
                        help='substring filter on config path')
    args = parser.parse_args()
    root = osp.join(osp.dirname(__file__), '..', 'configs')
    cfgs = sorted(p for p in glob.glob(osp.join(root, '*', '*.py'))
                  if '_base_' not in p and args.filter in p)
    rows, failed = [], []
    for p in cfgs:
        name = osp.relpath(p, root)
        t0 = time.time()
        try:
            n_params = smoke_one(p)
            rows.append((name, 'OK', f'{n_params/1e6:.1f}M',
                         f'{time.time()-t0:.1f}s'))
        except Exception:
            rows.append((name, 'FAIL', '-', f'{time.time()-t0:.1f}s'))
            failed.append((name, traceback.format_exc()))
    w = max(len(r[0]) for r in rows) + 2
    for r in rows:
        print(f'{r[0]:<{w}} {r[1]:<5} {r[2]:>8} {r[3]:>7}')
    for name, tb in failed:
        print(f'\n--- {name} ---\n{tb}')
    sys.exit(1 if failed else 0)


if __name__ == '__main__':
    main()
