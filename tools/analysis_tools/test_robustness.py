"""Corruption-robustness benchmark: evaluate a checkpoint across
corruption types x severities (reference:
tools/analysis_tools/test_robustness.py). Uses the native Corrupt
transform (12 corruption types; snow/frost/fog/glass/zoom/elastic need
the imagecorruptions package assets, absent here)."""
import argparse
import copy
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))

from swindet_tpu.datasets import build_dataset
from swindet_tpu.datasets.pipelines.extra_augs import Corrupt
from swindet_tpu.utils import Config, DictAction, get_root_logger


def parse_args():
    parser = argparse.ArgumentParser(
        description='corruption robustness benchmark')
    parser.add_argument('config')
    parser.add_argument('checkpoint')
    parser.add_argument('--out', help='output result file (pkl)')
    parser.add_argument('--corruptions', type=str, nargs='+',
                        default=['benchmark'],
                        help='corruption names or "benchmark"/"noise"/'
                             '"blur"/"digital"')
    parser.add_argument('--severities', type=int, nargs='+',
                        default=[0, 1, 2, 3, 4, 5])
    parser.add_argument('--eval', type=str, nargs='+', default=['bbox'])
    parser.add_argument('--samples-per-gpu', type=int, default=8)
    parser.add_argument('--cfg-options', nargs='+', action=DictAction)
    return parser.parse_args()


GROUPS = {
    'benchmark': list(Corrupt.BENCHMARK),
    'noise': ['gaussian_noise', 'shot_noise', 'impulse_noise'],
    'blur': ['defocus_blur', 'motion_blur', 'gaussian_blur'],
    'digital': ['contrast', 'brightness', 'jpeg_compression', 'pixelate',
                'saturate'],
}


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options is not None:
        cfg.merge_from_dict(args.cfg_options)
    logger = get_root_logger()

    corruptions = []
    for c in args.corruptions:
        corruptions.extend(GROUPS.get(c, [c]))

    from swindet_tpu.apis.inference import init_detector
    from swindet_tpu.apis.test import single_gpu_test
    model = init_detector(cfg, args.checkpoint)

    aggregated = {}
    for corruption in corruptions:
        for severity in args.severities:
            test_cfg = copy.deepcopy(dict(cfg.data.test))
            if severity > 0:
                # corruption applies to the raw image, before the
                # resize/normalize chain (reference :175)
                pipeline = [dict(p) for p in test_cfg['pipeline']]
                pipeline.insert(1, dict(type='Corrupt',
                                        corruption=corruption,
                                        severity=severity))
                test_cfg['pipeline'] = pipeline
            test_cfg['test_mode'] = True
            dataset = build_dataset(test_cfg)
            logger.info(f'--- {corruption} severity {severity} ---')
            results = single_gpu_test(
                model, dataset, batch_size=args.samples_per_gpu,
                logger=logger)
            metrics = dataset.evaluate(results, metric=args.eval,
                                       logger=logger)
            aggregated[(corruption, severity)] = metrics
            if severity == 0:
                break   # severity 0 == clean, identical across types

    if args.out:
        with open(args.out, 'wb') as f:
            pickle.dump(aggregated, f)
    print(aggregated)


if __name__ == '__main__':
    main()
