"""LR schedules from ``lr_config`` (reference: mmcv LrUpdaterHook —
step/cosine policies with linear/constant/exp warmup, as used by
configs/_base_/schedules/*.py).

Pure step → lr functions (jnp-traceable) so the schedule lives inside
the jitted train step via optax.scale_by_schedule — no per-iter host
hook needed.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp


def build_lr_schedule(lr_config: dict, base_lr: float,
                      iters_per_epoch: int
                      ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """lr_config like ``dict(policy='step', warmup='linear',
    warmup_iters=500, warmup_ratio=0.001, step=[8, 11])`` (epochs)."""
    cfg = dict(lr_config)
    policy = cfg.get('policy', 'step')
    warmup = cfg.get('warmup')
    warmup_iters = int(cfg.get('warmup_iters', 500))
    warmup_ratio = float(cfg.get('warmup_ratio', 0.1))
    by_epoch = cfg.get('by_epoch', True)

    if policy == 'step':
        steps = cfg['step']
        if isinstance(steps, int):
            steps = [steps]
        gamma = float(cfg.get('gamma', 0.1))
        boundaries = jnp.asarray(
            [s * iters_per_epoch if by_epoch else s for s in steps],
            jnp.float32)

        def regular(step):
            n = jnp.sum(step >= boundaries)
            return base_lr * gamma ** n
    elif policy == 'cosine' or policy == 'CosineAnnealing':
        max_iters = int(cfg['max_iters'])
        min_lr = float(cfg.get('min_lr', 0.0))

        def regular(step):
            t = jnp.clip(step / max_iters, 0.0, 1.0)
            return min_lr + (base_lr - min_lr) * 0.5 * (
                1 + jnp.cos(jnp.pi * t))
    elif policy == 'fixed':
        def regular(step):
            return jnp.asarray(base_lr, jnp.float32)
    else:
        raise KeyError(f'Unsupported lr policy {policy}')

    if warmup is None:
        return lambda step: jnp.asarray(regular(step), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        reg = regular(step)
        frac = jnp.clip(step / warmup_iters, 0.0, 1.0)
        if warmup == 'linear':
            k = warmup_ratio + (1.0 - warmup_ratio) * frac
            warm = reg * k
        elif warmup == 'constant':
            warm = reg * warmup_ratio
        elif warmup == 'exp':
            warm = reg * warmup_ratio ** (1.0 - frac)
        else:
            raise KeyError(f'Unsupported warmup {warmup}')
        return jnp.where(step < warmup_iters, warm, reg)

    return schedule
