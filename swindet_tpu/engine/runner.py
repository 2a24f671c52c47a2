"""Epoch-based training runner (TPU-native replacement for mmcv
Runner/Hooks + EpochBasedRunnerAmp at
mmcv_custom/runner/epoch_based_runner.py:20 and the hook registrations
in mmdet/apis/train.py:140-179).

Host loop responsibilities only: draw batches, call the ONE jitted train
step, log, checkpoint, eval. LR lives inside the optimizer schedule;
grad all-reduce lives inside the jitted step via sharding.
"""
from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np
import jax

from ..parallel.mesh import shard_batch, replicate


class EpochBasedRunner:

    def __init__(self,
                 train_step: Callable,
                 mesh,
                 work_dir: str,
                 logger,
                 max_epochs: int,
                 checkpoint_interval: int = 1,
                 log_interval: int = 50,
                 eval_fn: Optional[Callable] = None,
                 eval_interval: int = 1,
                 save_fn: Optional[Callable] = None,
                 meta: Optional[dict] = None,
                 save_best: Optional[str] = None,
                 save_best_rule: str = 'auto',
                 tensorboard: bool = False):
        self.train_step = train_step
        self.mesh = mesh
        self.work_dir = work_dir
        self.logger = logger
        self.max_epochs = max_epochs
        self.checkpoint_interval = checkpoint_interval
        self.log_interval = log_interval
        self.eval_fn = eval_fn
        self.eval_interval = eval_interval
        self.save_fn = save_fn
        self.meta = meta or {}
        # save_best tracking (reference: mmcv EvalHook save_best/rule —
        # 'auto' = greater for mAP/AR/acc-style keys, less for loss)
        self.save_best = save_best
        if save_best and save_best_rule == 'auto':
            save_best_rule = 'less' if 'loss' in save_best else 'greater'
        self.save_best_rule = save_best_rule
        self.best_score: Optional[float] = None
        self.epoch = 0
        os.makedirs(work_dir, exist_ok=True)
        self._json_log = osp.join(
            work_dir, f'{time.strftime("%Y%m%d_%H%M%S")}.log.json')
        # Tensorboard writer (reference: mmcv TensorboardLoggerHook)
        self._tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(osp.join(work_dir, 'tf_logs'))
            except Exception:
                self.logger.warning('tensorboardX unavailable; '
                                    'Tensorboard logging disabled')
        self._global_iter = 0

    def _log_json(self, record: dict):
        with open(self._json_log, 'a') as f:
            f.write(json.dumps(record) + '\n')
        if self._tb is not None:
            mode = record.get('mode', 'train')
            step = self._global_iter
            for k, v in record.items():
                if k in ('mode', 'epoch', 'iter'):
                    continue
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(f'{mode}/{k}', v, step)

    def run(self, state, loader, rng, resume_epoch: int = 0):
        """Train ``max_epochs`` epochs from ``resume_epoch``; returns the
        final state."""
        self.epoch = resume_epoch
        total_iters = len(loader)
        while self.epoch < self.max_epochs:
            loader.set_epoch(self.epoch)
            t_data = t_step = 0.0
            window: Dict[str, List[float]] = {}
            t0 = time.perf_counter()
            for i, batch in enumerate(loader):
                batch.pop('img_metas', None)
                t1 = time.perf_counter()
                sbatch = shard_batch(self.mesh, batch)
                state, metrics = self.train_step(state, sbatch, rng)
                self._global_iter += 1
                t2 = time.perf_counter()
                t_data += t1 - t0
                t_step += t2 - t1
                for k, v in metrics.items():
                    window.setdefault(k, []).append(float(v))
                if (i + 1) % self.log_interval == 0 or \
                        i + 1 == total_iters:
                    means = {k: float(np.mean(v))
                             for k, v in window.items()}
                    n = len(next(iter(window.values())))
                    msg = (f'Epoch [{self.epoch + 1}/{self.max_epochs}]'
                           f'[{i + 1}/{total_iters}] '
                           f'data {t_data / n:.3f}s step {t_step / n:.3f}s '
                           + ' '.join(f'{k}: {v:.4f}'
                                      for k, v in means.items()))
                    self.logger.info(msg)
                    self._log_json(dict(mode='train',
                                        epoch=self.epoch + 1, iter=i + 1,
                                        data_time=t_data / n,
                                        step_time=t_step / n, **means))
                    window.clear()
                    t_data = t_step = 0.0
                t0 = time.perf_counter()
            self.epoch += 1
            if self.save_fn and self.epoch % self.checkpoint_interval == 0:
                path = osp.join(self.work_dir, f'epoch_{self.epoch}')
                self.save_fn(path, state, dict(self.meta,
                                               epoch=self.epoch))
                latest = osp.join(self.work_dir, 'latest')
                try:  # latest symlink (reference epoch_based_runner.py:63)
                    if osp.lexists(latest):
                        os.remove(latest)
                    os.symlink(osp.basename(path), latest)
                except OSError:
                    pass
                self.logger.info(f'Saved checkpoint {path}')
            if self.eval_fn and self.epoch % self.eval_interval == 0:
                metrics = self.eval_fn(state, self.epoch)
                if metrics:
                    self.logger.info(
                        'Eval: ' + ' '.join(f'{k}: {v}'
                                            for k, v in metrics.items()))
                    numeric = {}
                    for k, v in metrics.items():
                        try:
                            numeric[k] = float(v)
                        except (TypeError, ValueError):
                            pass  # e.g. mAP_copypaste strings
                    self._log_json(dict(mode='val', epoch=self.epoch,
                                        **numeric))
                    self._maybe_save_best(state, numeric)
        return state

    def _maybe_save_best(self, state, numeric: Dict[str, float]):
        """Track the best eval score and keep a ``best_<key>`` checkpoint
        + symlink (reference: mmcv EvalHook save_best)."""
        if not (self.save_best and self.save_fn
                and self.save_best in numeric):
            return
        score = numeric[self.save_best]
        better = (self.best_score is None
                  or (score > self.best_score
                      if self.save_best_rule == 'greater'
                      else score < self.best_score))
        if not better:
            return
        self.best_score = score
        key = self.save_best.replace('/', '_')
        path = osp.join(self.work_dir, f'best_{key}_epoch_{self.epoch}')
        self.save_fn(path, state, dict(self.meta, epoch=self.epoch,
                                       best_score=score))
        link = osp.join(self.work_dir, f'best_{key}')
        try:
            if osp.lexists(link):
                import shutil
                target = osp.join(self.work_dir, os.readlink(link))
                os.remove(link)
                if osp.isdir(target) and target != path:
                    shutil.rmtree(target, ignore_errors=True)
            os.symlink(osp.basename(path), link)
        except OSError:
            pass
        self.logger.info(
            f'Best {self.save_best} = {score:.4f} at epoch {self.epoch}; '
            f'saved {path}')
