"""Training-log analysis (reference: tools/analysis_tools/analyze_logs.py)
— plot curves / compute iter times from the runner's *.log.json files."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), '..', '..'))
import argparse
import json
from collections import defaultdict

import numpy as np


def load_json_logs(json_logs):
    run_dicts = []
    for path in json_logs:
        d = defaultdict(list)
        with open(path) as f:
            for line in f:
                rec = json.loads(line.strip())
                if rec.get('mode') != 'train':
                    continue
                for k, v in rec.items():
                    d[k].append(v)
        run_dicts.append(d)
    return run_dicts


def main():
    p = argparse.ArgumentParser(description='Analyze training json logs')
    sub = p.add_subparsers(dest='task', required=True)
    pc = sub.add_parser('plot_curve')
    pc.add_argument('json_logs', nargs='+')
    pc.add_argument('--keys', nargs='+', default=['loss'])
    pc.add_argument('--out', default=None)
    pc.add_argument('--title', default=None)
    ct = sub.add_parser('cal_train_time')
    ct.add_argument('json_logs', nargs='+')
    args = p.parse_args()

    runs = load_json_logs(args.json_logs)
    if args.task == 'cal_train_time':
        for path, d in zip(args.json_logs, runs):
            times = np.asarray(d.get('step_time', []))
            if times.size == 0:
                print(f'{path}: no step_time records')
                continue
            print(f'{path}: mean {times.mean()*1000:.1f} ms/iter, '
                  f'fastest {times.min()*1000:.1f}, '
                  f'slowest {times.max()*1000:.1f}')
        return
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    for path, d in zip(args.json_logs, runs):
        for key in args.keys:
            if key not in d:
                print(f'{path}: missing key {key}')
                continue
            plt.plot(range(len(d[key])), d[key],
                     label=f'{_osp.basename(path)}:{key}')
    plt.xlabel('log step')
    plt.legend()
    if args.title:
        plt.title(args.title)
    out = args.out or 'curve.png'
    plt.savefig(out)
    print(f'saved {out}')


if __name__ == '__main__':
    main()
