"""Optimizer construction from config (reference: mmcv build_optimizer +
the Swin configs' ``paramwise_cfg.custom_keys`` decay/lr multipliers,
configs/swin/mask_rcnn_swin_tiny_..._1x_coco.py:64-67).

TPU-native design: one optax chain; per-parameter weight-decay and lr
multipliers are pytrees precomputed from the param *paths* (the flax
analog of the torch param names the reference matches substrings on).
Everything is a pure GradientTransformation — no in-place param groups.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def param_path_name(path: Tuple[Any, ...]) -> str:
    """flax param path → the EXACT torch param name the reference's
    custom_keys substring-match would see (mmcv
    DefaultOptimizerConstructor matches on ``name`` from
    named_parameters). Routes through the production converter's
    path→key mapping so the partition is identical to the reference's
    param-group partition over the real flagship tree (pinned by
    tests/test_engine/test_optim_trajectory_parity.py)."""
    from ..checkpoint import flax_path_to_torch_key
    parts = []
    for p in path:
        key = getattr(p, 'key', None)
        if key is None:
            key = getattr(p, 'idx', None)
        if key is None:
            key = str(p)
        parts.append(str(key))
    return flax_path_to_torch_key(tuple(parts))


def build_multiplier_trees(params, paramwise_cfg: Optional[dict]):
    """Return (decay_mult_tree, lr_mult_tree) matching ``params``.

    Matches the reference semantics (mmcv DefaultOptimizerConstructor):
    the *longest* custom_key contained in the param name wins; default
    mult is 1.0. 1-D params (norms/biases) keep decay_mult from matching
    'norm' only via the name, as in the reference.
    """
    custom_keys = {}
    if paramwise_cfg:
        custom_keys = dict(paramwise_cfg.get('custom_keys', {}))
    # mmcv DefaultOptimizerConstructor: alphabetical, then stable-sorted
    # by length descending — longest key wins, ties alphabetical
    sorted_keys = sorted(sorted(custom_keys), key=len, reverse=True)

    def mults(path, leaf):
        name = param_path_name(path)
        for key in sorted_keys:
            if key in name:
                c = custom_keys[key]
                return (float(c.get('decay_mult', 1.0)),
                        float(c.get('lr_mult', 1.0)))
        return (1.0, 1.0)

    both = jax.tree_util.tree_map_with_path(mults, params)
    decay = jax.tree_util.tree_map(lambda t: t[0], both,
                                   is_leaf=lambda x: isinstance(x, tuple))
    lr = jax.tree_util.tree_map(lambda t: t[1], both,
                                is_leaf=lambda x: isinstance(x, tuple))
    return decay, lr


def clip_by_global_norm_torch(max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics, exactly: the scale is
    ``min(max_norm / (total_norm + 1e-6), 1.0)`` — note the 1e-6 in the
    denominator, which optax.clip_by_global_norm omits. The reference's
    OptimizerHook.clip_grads routes through torch's version, so
    trajectory parity requires the epsilon (pinned by
    tests/test_engine/test_optim_trajectory_parity.py)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        norm = optax.global_norm(updates)
        coef = jnp.minimum(max_norm / (norm + 1e-6), 1.0)
        updates = jax.tree_util.tree_map(lambda g: g * coef, updates)
        return updates, state

    return optax.GradientTransformation(init, update)


def _add_decayed_weights_mult(weight_decay: float, decay_mult_tree):
    """optax.add_decayed_weights with a per-param multiplier tree."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        if params is None:
            raise ValueError('params required for weight decay')
        updates = jax.tree_util.tree_map(
            lambda g, p, m: g + weight_decay * m * p,
            updates, params, decay_mult_tree)
        return updates, state

    return optax.GradientTransformation(init, update)


def _scale_by_mult(lr_mult_tree):
    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        updates = jax.tree_util.tree_map(lambda g, m: g * m,
                                         updates, lr_mult_tree)
        return updates, state

    return optax.GradientTransformation(init, update)


def build_optimizer(params,
                    optimizer_cfg: dict,
                    lr_schedule: Callable[[jnp.ndarray], jnp.ndarray],
                    grad_clip: Optional[dict] = None,
                    update_interval: int = 1
                    ) -> optax.GradientTransformation:
    """cfg (e.g. ``dict(type='AdamW', lr=1e-4, betas=(0.9,0.999),
    weight_decay=0.05, paramwise_cfg=...)``) → optax chain.

    ``lr_schedule`` maps step → lr (absolute, already including base lr).
    ``update_interval`` > 1 enables gradient accumulation (reference:
    DistOptimizerHook at mmdet/utils/optimizer.py:9 — loss/k per iter,
    optimizer step every k iters == mean-gradient MultiSteps). The lr
    schedule stays in *iteration* units (the reference's LrUpdaterHook
    steps per iteration): the inner update count advances once per k
    iterations, so it is rescaled by k before entering the schedule.
    """
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop('type')
    paramwise_cfg = cfg.pop('paramwise_cfg', None)
    decay_tree, lr_tree = build_multiplier_trees(params, paramwise_cfg)

    chain = []
    if grad_clip:
        if int(grad_clip.get('norm_type', 2)) != 2:
            raise ValueError('only norm_type=2 grad clipping is supported')
        chain.append(clip_by_global_norm_torch(float(grad_clip['max_norm'])))

    if opt_type == 'AdamW':
        b1, b2 = cfg.get('betas', (0.9, 0.999))
        chain.append(optax.scale_by_adam(b1=b1, b2=b2,
                                         eps=cfg.get('eps', 1e-8)))
        wd = cfg.get('weight_decay', 0.0)
        if wd:
            chain.append(_add_decayed_weights_mult(wd, decay_tree))
    elif opt_type == 'SGD':
        mom = cfg.get('momentum', 0.0)
        wd = cfg.get('weight_decay', 0.0)
        if wd:
            # torch SGD applies wd to the gradient BEFORE momentum
            chain.append(_add_decayed_weights_mult(wd, decay_tree))
        if mom:
            chain.append(optax.trace(decay=mom,
                                     nesterov=cfg.get('nesterov', False)))
    elif opt_type == 'Adam':
        b1, b2 = cfg.get('betas', (0.9, 0.999))
        chain.append(optax.scale_by_adam(b1=b1, b2=b2,
                                         eps=cfg.get('eps', 1e-8)))
    else:
        raise KeyError(f'Unsupported optimizer {opt_type}')

    chain.append(_scale_by_mult(lr_tree))
    k = max(int(update_interval), 1)
    chain.append(optax.scale_by_schedule(
        lambda step: -lr_schedule(step * k)))
    tx = optax.chain(*chain)
    if k > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=k)
    return tx
