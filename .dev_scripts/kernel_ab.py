"""One-shot hardware A/B for the opt-in kernels, to run as soon as the
TPU tunnel is up:

  python .dev_scripts/kernel_ab.py            # all experiments
  python .dev_scripts/kernel_ab.py train      # train-step A/Bs only
  python .dev_scripts/kernel_ab.py infer      # bench.py A/Bs only

Experiments (each re-execs the target in a fresh process so the env
flag is seen at trace time):
  train  baseline            .dev_scripts/train_bench.py
  train  SWINDET_WATTN_V4=1   (fused qkv+attention+proj kernel)
  train  SWINDET_FUSED_MLP=1  (fused fc1+gelu+fc2 kernel)
  train  both
  infer  baseline            bench.py
  infer  SWINDET_PALLAS_NMS=1 (single-kernel NMS scan)
  infer  SWINDET_WATTN_V4=1 + SWINDET_FUSED_MLP=1

Prints one summary table; paste winners into PERF.md and flip the
defaults in models/backbones/swin.py / models/layers.py / core/nms.py.
"""
import os
import os.path as osp
import subprocess
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))

TRAIN = [
    ('train-baseline', {}),
    ('train-wattn-v4', {'SWINDET_WATTN_V4': '1'}),
    ('train-fused-mlp', {'SWINDET_FUSED_MLP': '1'}),
    ('train-both', {'SWINDET_WATTN_V4': '1', 'SWINDET_FUSED_MLP': '1'}),
]
INFER = [
    ('infer-baseline', {}),
    ('infer-pallas-nms', {'SWINDET_PALLAS_NMS': '1'}),
    ('infer-both-kernels',
     {'SWINDET_WATTN_V4': '1', 'SWINDET_FUSED_MLP': '1'}),
]


def run(name, extra_env, script):
    env = dict(os.environ, **extra_env)
    print(f'=== {name} ({script}) env={extra_env}', flush=True)
    r = subprocess.run([sys.executable, osp.join(ROOT, script)],
                       env=env, capture_output=True, text=True,
                       timeout=1800)
    tail = (r.stdout + r.stderr).strip().splitlines()[-8:]
    print('\n'.join(tail), flush=True)
    return tail[-1] if tail else '?'


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    results = {}
    if which in ('all', 'train'):
        for name, env in TRAIN:
            results[name] = run(name, env, '.dev_scripts/train_bench.py')
    if which in ('all', 'infer'):
        for name, env in INFER:
            results[name] = run(name, env, 'bench.py')
    print('\n==== summary ====')
    for k, v in results.items():
        print(f'{k:22s} {v}')


if __name__ == '__main__':
    main()
