"""Evaluate saved pkl results against a dataset without re-running
inference (reference: tools/analysis_tools/eval_metric.py)."""
import argparse
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))

from swindet_tpu.datasets import build_dataset
from swindet_tpu.utils import Config, DictAction


def parse_args():
    parser = argparse.ArgumentParser(
        description='Evaluate metric of results saved in pkl format')
    parser.add_argument('config', help='config of the model')
    parser.add_argument('pkl_results', help='results in pickle format')
    parser.add_argument('--format-only', action='store_true')
    parser.add_argument('--eval', type=str, nargs='+',
                        help='metrics, e.g. "bbox", "segm"')
    parser.add_argument('--cfg-options', nargs='+', action=DictAction)
    parser.add_argument('--eval-options', nargs='+', action=DictAction)
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    assert args.eval or args.format_only, (
        'specify at least one of --eval / --format-only')
    if args.cfg_options is not None:
        cfg.merge_from_dict(args.cfg_options)
    cfg.data.test['test_mode'] = True

    dataset = build_dataset(dict(cfg.data.test))
    with open(args.pkl_results, 'rb') as f:
        outputs = pickle.load(f)

    kwargs = {} if args.eval_options is None else args.eval_options
    if args.format_only:
        dataset.results2json(outputs, **kwargs)
    if args.eval:
        eval_kwargs = dict(cfg.get('evaluation', {}) or {})
        for key in ['interval', 'tmpdir', 'start', 'gpu_collect',
                    'save_best', 'rule']:
            eval_kwargs.pop(key, None)
        eval_kwargs.update(dict(metric=args.eval, **kwargs))
        print(dataset.evaluate(outputs, **eval_kwargs))


if __name__ == '__main__':
    main()
