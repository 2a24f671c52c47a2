"""Aggregate corruption-benchmark results into mPC / rPC (reference:
tools/analysis_tools/robustness_eval.py — Hendrycks robustness
metrics: P = clean performance, mPC = mean over corruptions x
severities 1-5, rPC = mPC / P)."""
import argparse
import pickle

import numpy as np


def get_results(path, metric='bbox_mAP', prints='mPC'):
    with open(path, 'rb') as f:
        agg = pickle.load(f)

    clean = None
    per_corruption = {}
    for (corruption, severity), metrics in agg.items():
        if severity == 0:
            clean = metrics[metric]
        else:
            per_corruption.setdefault(corruption, {})[severity] = \
                metrics[metric]

    rows = []
    for corruption, sevs in sorted(per_corruption.items()):
        vals = [sevs[s] for s in sorted(sevs)]
        rows.append((corruption, float(np.mean(vals))))

    mPC = float(np.mean([v for _, v in rows])) if rows else float('nan')
    out = {'P': clean, 'mPC': mPC,
           'rPC': (mPC / clean if clean else float('nan'))}
    if prints in ('P', 'all'):
        print(f'Performance on clean data [P] ({metric}) = {clean}')
    if prints in ('mPC', 'all'):
        for corruption, v in rows:
            print(f'  {corruption:>20s}: {v:.4f}')
        print(f'Mean Performance under Corruption [mPC] ({metric}) '
              f'= {mPC:.4f}')
    if prints in ('rPC', 'all') and clean:
        print(f'Relative Performance under Corruption [rPC] '
              f'= {out["rPC"]:.1%}')
    return out


def main():
    parser = argparse.ArgumentParser(
        description='robustness metric aggregation')
    parser.add_argument('filename', help='pkl from test_robustness.py')
    parser.add_argument('--metric', default='bbox_mAP')
    parser.add_argument('--prints', default='all',
                        choices=['P', 'mPC', 'rPC', 'all'])
    args = parser.parse_args()
    get_results(args.filename, metric=args.metric, prints=args.prints)


if __name__ == '__main__':
    main()
