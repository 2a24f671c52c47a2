"""Test / evaluation CLI (reference: tools/test.py:100-218 — same
surface: --out, --eval, --format-only, --show-dir)."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), *(['..'] * ('analysis_tools' in _osp.dirname(_osp.abspath(__file__)) and 2 or 1))))
import argparse
import os.path as osp
import pickle

from swindet_tpu.apis.inference import DetectorHandle, init_detector
from swindet_tpu.apis.test import multi_gpu_test, single_gpu_test
from swindet_tpu.datasets import build_dataset
from swindet_tpu.utils import Config, DictAction, get_root_logger


def parse_args():
    parser = argparse.ArgumentParser(description='Test a detector')
    parser.add_argument('config')
    parser.add_argument('checkpoint')
    parser.add_argument('--out', help='output result pickle file')
    parser.add_argument('--eval', type=str, nargs='+',
                        help='metrics: bbox segm proposal')
    parser.add_argument('--format-only', action='store_true')
    parser.add_argument('--show-dir',
                        help='directory to save painted images')
    parser.add_argument('--show-score-thr', type=float, default=0.3)
    parser.add_argument('--samples-per-gpu', type=int, default=8)
    parser.add_argument('--cfg-options', nargs='+', action=DictAction)
    parser.add_argument('--eval-options', nargs='+', action=DictAction)
    parser.add_argument('--launcher', default='none',
                        choices=['none', 'pytorch', 'slurm', 'mpi',
                                 'jax'])
    return parser.parse_args()


def main():
    args = parse_args()
    assert args.out or args.eval or args.format_only or args.show_dir, \
        'Please specify at least one of --out / --eval / --format-only' \
        ' / --show-dir'
    cfg = Config.fromfile(args.config)
    if args.cfg_options is not None:
        cfg.merge_from_dict(args.cfg_options)
    if args.launcher != 'none':
        import jax
        jax.distributed.initialize()

    logger = get_root_logger()
    handle = init_detector(cfg, args.checkpoint)
    dataset = build_dataset(dict(cfg.data.test, test_mode=True))
    handle.CLASSES = dataset.CLASSES or handle.CLASSES

    results = multi_gpu_test(handle, dataset,
                             batch_size=args.samples_per_gpu,
                             logger=logger)

    if args.out:
        logger.info(f'writing results to {args.out}')
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)
    if args.format_only:
        dataset.results2json(results, osp.splitext(args.out or
                                                   'results')[0])
    if args.eval:
        eval_kwargs = dict(args.eval_options or {})
        metrics = dataset.evaluate(results, metric=args.eval,
                                   logger=logger, **eval_kwargs)
        print(metrics)
    if args.show_dir:
        import os
        from swindet_tpu.apis.inference import show_result
        os.makedirs(args.show_dir, exist_ok=True)
        for i in range(len(dataset)):
            info = dataset.data_infos[i]
            img_path = osp.join(dataset.img_prefix, info['filename'])
            show_result(img_path, results[i], handle.CLASSES,
                        score_thr=args.show_score_thr,
                        out_file=osp.join(args.show_dir,
                                          info['filename']))


if __name__ == '__main__':
    main()
