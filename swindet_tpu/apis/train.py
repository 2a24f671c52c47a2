"""Training API (reference: mmdet/apis/train.py:42 train_detector —
dataloaders → optimizer → AMP → DDP wrap → runner + hooks → run).

TPU-native: one jitted data-parallel train step over a Mesh replaces
DDP/apex; bf16 compute policy replaces AMP O1; the runner is a thin
host loop (engine/runner.py).
"""
from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..datasets import build_dataloader, build_dataset
from ..engine import (TrainState, build_lr_schedule, build_optimizer,
                      jit_train_step, make_train_step)
from ..engine.runner import EpochBasedRunner
from ..models import build_detector
from ..parallel import make_mesh, replicate
from ..utils import get_root_logger


def set_random_seed(seed: int, deterministic: bool = False):
    """(reference: apis/train.py:23). JAX rngs are explicit; this seeds
    the host-side numpy/python pipelines."""
    random.seed(seed)
    np.random.seed(seed)


def init_detector_variables(model, cfg, logger, seed: int = 0):
    """Init params; then load pretrained backbone / load_from weights."""
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    from ..utils import jit_init
    variables = jit_init(
        model,
        {'params': jax.random.PRNGKey(seed),
         'sampling': jax.random.PRNGKey(seed + 1)},
        dummy, method='forward_dummy')
    pretrained = dict(cfg.model).get('pretrained')
    if pretrained:
        from ..checkpoint import load_checkpoint
        logger.info(f'Loading pretrained backbone from {pretrained}')
        variables, _ = load_checkpoint(model, variables, pretrained,
                                       model_cfg=dict(cfg.model))
    if cfg.get('load_from'):
        from ..checkpoint import load_checkpoint
        logger.info(f'load_from {cfg.load_from}')
        variables, _ = load_checkpoint(model, variables, cfg.load_from)
    return variables


def train_detector(model, dataset, cfg, distributed: bool = False,
                   validate: bool = False, timestamp=None, meta=None):
    """(reference: apis/train.py:42)."""
    import logging
    logger = get_root_logger(
        log_level=getattr(logging, str(cfg.get('log_level', 'INFO')),
                          logging.INFO))

    # the reference's ``workflow`` key (runner.run phases) is honored
    # for its only published value [('train', N)]; interleaved 'val'
    # phases are rejected explicitly rather than silently ignored —
    # use ``evaluation`` (EvalHook parity) for validation.
    workflow = cfg.get('workflow')
    if workflow:
        phases = {p[0] if isinstance(p, (tuple, list)) else p
                  for p in workflow}
        if phases - {'train'}:
            raise ValueError(
                f"workflow={workflow!r}: only [('train', N)] is "
                "supported; val-loss interleaving is expressed via the "
                "'evaluation' config key in this framework")

    mesh = make_mesh()
    n_dev = mesh.shape['data']

    samples_per_gpu = cfg.data.samples_per_gpu
    global_batch = samples_per_gpu * n_dev
    loader_cfg = dict(cfg.data.get('train_dataloader', {}))
    # static canvas from the pipeline's declared geometry — the COCO
    # default (1344x832) on a small-resolution config is nearly all
    # zero padding, whose constant tokens explode LayerNorm gradients
    from ..datasets.builder import derive_canvas
    # unwrap dataset wrappers (RepeatDataset/ClassBalancedDataset/...)
    # whose pipeline lives on the nested 'dataset' key — otherwise a
    # small-canvas config silently falls back to the COCO default
    # (advisor r4)
    train_cfg_ds = cfg.data.train
    while ('pipeline' not in train_cfg_ds
           and 'dataset' in train_cfg_ds):
        train_cfg_ds = train_cfg_ds['dataset']
    canvas_long, canvas_short = derive_canvas(
        train_cfg_ds.get('pipeline', []))
    loader_cfg.setdefault('canvas_long', canvas_long)
    loader_cfg.setdefault('canvas_short', canvas_short)
    logger.info(f'Train canvas: {canvas_long}x{canvas_short} '
                f'(landscape; derived from pipeline)')
    # C++ batch loader for the canonical mstrain recipe (decode +
    # rescale + flip + normalize + pad GIL-free); silently falls back
    # to the Python/cv2 pipeline for any other transform stack
    if 'native_plan' not in loader_cfg:
        from ..datasets.builder import derive_native_train_plan
        plan = derive_native_train_plan(dataset,
                                        seed=cfg.get('seed', 0) or 0)
        if plan is not None:
            loader_cfg['native_plan'] = plan
            logger.info('Native C++ train loader engaged')
    train_loader = build_dataloader(
        dataset, samples_per_gpu=samples_per_gpu,
        workers_per_gpu=cfg.data.workers_per_gpu, num_gpus=n_dev,
        dist=distributed, seed=cfg.get('seed', 0) or 0,
        with_mask=any('gt_masks' in str(p)
                      for p in cfg.data.train.get('pipeline', [])),
        **loader_cfg)

    # ---- optimizer + schedule
    max_epochs = dict(cfg.runner)['max_epochs']
    iters_per_epoch = len(train_loader)
    base_lr = dict(cfg.optimizer)['lr']
    lr_schedule = build_lr_schedule(dict(cfg.lr_config), base_lr,
                                    iters_per_epoch)

    variables = init_detector_variables(model, cfg, logger,
                                        seed=cfg.get('seed', 0) or 0)
    params = variables.pop('params') if 'params' in variables else \
        variables['params']
    model_state = {k: v for k, v in variables.items() if k != 'params'}

    opt_config = dict(cfg.get('optimizer_config', {}) or {})
    grad_clip = opt_config.get('grad_clip')
    # gradient accumulation (reference: DistOptimizerHook update_interval)
    update_interval = int(opt_config.get('update_interval', 1))
    if update_interval > 1:
        logger.info(f'Gradient accumulation: update_interval='
                    f'{update_interval} (effective global batch '
                    f'{global_batch * update_interval})')
    tx = build_optimizer(params, dict(cfg.optimizer), lr_schedule,
                         grad_clip, update_interval=update_interval)

    # EMA hook (reference: mmcv EMAHook via custom_hooks)
    ema_momentum = None
    for hook in (cfg.get('custom_hooks') or []):
        hook = dict(hook)
        if hook.get('type') == 'EMAHook':
            ema_momentum = float(hook.get('momentum', 0.0002))
            logger.info(f'EMA enabled (momentum={ema_momentum})')

    state = TrainState.create(params, tx, model_state,
                              with_ema=ema_momentum is not None)

    step = jit_train_step(
        make_train_step(model, tx, ema_momentum=ema_momentum), mesh)
    state = replicate(mesh, state)

    # ---- checkpoint save/resume
    from ..checkpoint import (save_train_state, load_train_state,
                              wait_for_async_saves)
    async_save = bool(dict(cfg.get('checkpoint_config', {})
                           or {}).get('async_save', False))

    def save_fn(path, st, mt):
        save_train_state(path, st, mt, async_save=async_save)

    resume_epoch = 0
    if cfg.get('resume_from'):
        state, ckpt_meta = load_train_state(cfg.resume_from, state)
        resume_epoch = int(ckpt_meta.get('epoch', 0))
        logger.info(f'Resumed from {cfg.resume_from} '
                    f'(epoch {resume_epoch})')

    # ---- eval hook
    eval_fn = None
    if validate:
        val_dataset = build_dataset(dict(cfg.data.val, test_mode=True))
        eval_cfg = dict(cfg.get('evaluation', {}) or {})
        metric = eval_cfg.get('metric', 'bbox')

        def eval_fn(st, epoch):
            from .inference import DetectorHandle
            from .test import single_gpu_test
            # eval with EMA shadow params when tracked (reference:
            # EMAHook swaps params for val)
            eval_params = st.ema_params if st.ema_params is not None \
                else st.params
            var = {'params': eval_params, **st.model_state}
            handle = DetectorHandle(cfg, model, var,
                                    CLASSES=val_dataset.CLASSES)
            results = single_gpu_test(
                handle, val_dataset,
                batch_size=cfg.data.get('val_samples_per_gpu',
                                        samples_per_gpu) * n_dev,
                logger=logger)
            return val_dataset.evaluate(results, metric=metric,
                                        logger=logger)

    runner = EpochBasedRunner(
        train_step=step, mesh=mesh,
        work_dir=cfg.work_dir, logger=logger, max_epochs=max_epochs,
        checkpoint_interval=dict(cfg.get('checkpoint_config', {})
                                 or {}).get('interval', 1),
        log_interval=dict(cfg.get('log_config', {})
                          or {}).get('interval', 50),
        eval_fn=eval_fn,
        eval_interval=dict(cfg.get('evaluation', {})
                           or {}).get('interval', 1),
        save_fn=save_fn, meta=meta,
        save_best=dict(cfg.get('evaluation', {}) or {}).get('save_best'),
        save_best_rule=dict(cfg.get('evaluation', {})
                            or {}).get('rule', 'auto'),
        tensorboard=any(
            dict(h).get('type') == 'TensorboardLoggerHook'
            for h in dict(cfg.get('log_config', {}) or {}).get(
                'hooks', [])))

    rng = jax.random.PRNGKey(cfg.get('seed', 0) or 0)
    logger.info(f'Start training: {n_dev} devices, global batch '
                f'{global_batch}, {iters_per_epoch} iters/epoch, '
                f'{max_epochs} epochs')
    final_state = runner.run(state, train_loader, rng,
                             resume_epoch=resume_epoch)
    wait_for_async_saves()
    return final_state
