"""Gather trained models from a tree of work_dirs into a model-zoo
table (reference counterpart: .dev_scripts/gather_models.py — collects
final checkpoints + logged metrics for zoo publication).

Scans ``<root>/<config_name>/`` directories produced by tools/train.py:
  - the newest ``*.log.json`` supplies train/val records;
  - ``best_*`` / ``epoch_N`` / ``latest`` checkpoint dirs are ranked
    (best > latest > highest epoch);
  - the last eval record's metrics (bbox_mAP, segm_mAP, ...) are pulled
    into the row.

Usage:
    python .dev_scripts/gather_models.py work_dirs/ [--out zoo.json]
    # one row per run; also prints a markdown table
"""
import argparse
import glob
import json
import os.path as osp


def _read_log(log_path):
    records = []
    with open(log_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                records.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return records


def _pick_checkpoint(run_dir):
    best = sorted(glob.glob(osp.join(run_dir, 'best_*')))
    if best:
        return best[-1]
    latest = osp.join(run_dir, 'latest')
    if osp.exists(latest):
        return latest
    epochs = glob.glob(osp.join(run_dir, 'epoch_*'))
    if epochs:
        return max(epochs, key=lambda p: int(p.rsplit('_', 1)[-1]))
    return None


def gather(root):
    rows = []
    for run_dir in sorted(glob.glob(osp.join(root, '*'))):
        if not osp.isdir(run_dir):
            continue
        logs = sorted(glob.glob(osp.join(run_dir, '*.log.json')))
        if not logs:
            continue
        records = _read_log(logs[-1])
        evals = [r for r in records if r.get('mode') == 'val']
        trains = [r for r in records if r.get('mode') == 'train']
        row = dict(config=osp.basename(run_dir),
                   checkpoint=_pick_checkpoint(run_dir),
                   epochs=max((r.get('epoch', 0) for r in records),
                              default=0))
        if trains:
            row['final_loss'] = trains[-1].get('loss')
        if evals:
            metrics = {k: v for k, v in evals[-1].items()
                       if k not in ('mode', 'epoch', 'iter', 'lr',
                                    'time')}
            row['metrics'] = metrics
        rows.append(row)
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('root', help='directory containing per-run work_dirs')
    ap.add_argument('--out', default=None, help='write rows as JSON')
    args = ap.parse_args()
    rows = gather(args.root)
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(rows, f, indent=2)
    keys = ['config', 'epochs', 'final_loss', 'checkpoint']
    print('| ' + ' | '.join(keys + ['metrics']) + ' |')
    print('|' + '---|' * (len(keys) + 1))
    for r in rows:
        metrics = ', '.join(f'{k}={v}' for k, v in
                            (r.get('metrics') or {}).items())
        print('| ' + ' | '.join(str(r.get(k, '')) for k in keys) +
              f' | {metrics} |')
    print(f'\n{len(rows)} runs gathered from {args.root}')


if __name__ == '__main__':
    main()
