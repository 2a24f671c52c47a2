"""Training CLI (reference: tools/train.py:86-183 — same argument
surface: --work-dir --resume-from --no-validate --seed --cfg-options)."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), *(['..'] * ('analysis_tools' in _osp.dirname(_osp.abspath(__file__)) and 2 or 1))))
import argparse
import copy
import os
import os.path as osp
import time

from swindet_tpu.apis.train import set_random_seed, train_detector
from swindet_tpu.datasets import build_dataset
from swindet_tpu.models import build_detector
from swindet_tpu.utils import Config, DictAction, collect_env, \
    get_root_logger


def parse_args():
    parser = argparse.ArgumentParser(description='Train a detector')
    parser.add_argument('config', help='train config file path')
    parser.add_argument('--work-dir', help='the dir to save logs/models')
    parser.add_argument('--resume-from',
                        help='checkpoint file to resume from')
    parser.add_argument('--no-validate', action='store_true',
                        help='skip validation during training')
    parser.add_argument('--seed', type=int, default=None)
    parser.add_argument('--deterministic', action='store_true')
    parser.add_argument('--debug-nans', action='store_true',
                        help='enable jax_debug_nans: raise at the first '
                             'NaN-producing primitive (sanity rail, '
                             'SURVEY §5.2)')
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        help='override config, xxx=yyy format')
    parser.add_argument('--launcher',
                        choices=['none', 'pytorch', 'slurm', 'mpi',
                                 'jax'],
                        default='none',
                        help='kept for surface compat; multi-host uses '
                             'jax.distributed')
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options is not None:
        cfg.merge_from_dict(args.cfg_options)
    if args.work_dir is not None:
        cfg.work_dir = args.work_dir
    elif cfg.get('work_dir') is None:
        cfg.work_dir = osp.join(
            './work_dirs', osp.splitext(osp.basename(args.config))[0])
    if args.resume_from is not None:
        cfg.resume_from = args.resume_from

    distributed = args.launcher != 'none'
    if distributed:
        import jax
        jax.distributed.initialize()
    if args.debug_nans:
        from swindet_tpu.utils import enable_debug_nans
        enable_debug_nans(True)

    os.makedirs(osp.abspath(cfg.work_dir), exist_ok=True)
    cfg.dump(osp.join(cfg.work_dir, osp.basename(args.config)))
    timestamp = time.strftime('%Y%m%d_%H%M%S', time.localtime())
    log_file = osp.join(cfg.work_dir, f'{timestamp}.log')
    logger = get_root_logger(log_level=cfg.get('log_level', 'INFO'),
                             log_file=log_file)

    env_info = '\n'.join(f'{k}: {v}' for k, v in collect_env().items())
    logger.info('Environment info:\n' + env_info)
    logger.info(f'Config:\n{cfg.pretty_text}')

    seed = args.seed if args.seed is not None else cfg.get('seed', 0)
    cfg.seed = seed
    set_random_seed(seed, deterministic=args.deterministic)
    meta = dict(env_info=env_info, config=cfg.pretty_text, seed=seed,
                exp_name=osp.basename(args.config))

    model_cfg = dict(cfg.model)
    if cfg.get('bf16'):
        # bf16 compute policy replaces the reference's apex AMP O1
        model_cfg['dtype'] = 'bfloat16'
    model = build_detector(model_cfg)
    datasets = build_dataset(dict(cfg.data.train))
    if hasattr(datasets, 'CLASSES'):
        meta['CLASSES'] = datasets.CLASSES
    from swindet_tpu.utils import check_num_classes
    check_num_classes(dict(cfg.model), datasets, logger)

    train_detector(model, datasets, cfg, distributed=distributed,
                   validate=not args.no_validate, timestamp=timestamp,
                   meta=meta)


if __name__ == '__main__':
    main()
