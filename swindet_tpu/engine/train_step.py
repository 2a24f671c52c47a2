"""The jitted training step + TrainState (TPU-native replacement for the
reference's Runner iteration: BaseDetector.train_step at
mmdet/models/detectors/base.py:220, _parse_losses :185, apex
DistOptimizerHook at mmdet/utils/optimizer.py:9).

Everything the reference does per iteration — forward, loss summation,
backward, DDP gradient all-reduce, loss-scale step, log-var all-reduce —
is ONE pure function compiled once per input bucket. Sharding the batch
over the ``data`` mesh axis makes XLA insert the gradient psum; log vars
come out already globally averaged.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
import flax.struct

from ..parallel.mesh import (DATA_AXIS, Mesh, data_sharded, replicated)
from jax.sharding import NamedSharding, PartitionSpec as P


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    model_state: Any  # non-param variable collections (e.g. batch_stats)
    # EMA shadow params (reference: mmcv EMAHook). None unless enabled.
    ema_params: Any = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation,
               model_state: Optional[dict] = None,
               with_ema: bool = False):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params),
                   model_state=model_state or {},
                   ema_params=jax.tree_util.tree_map(jnp.copy, params)
                   if with_ema else None)


def parse_losses(losses: Dict[str, jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Sum every '*loss*' key into the total; return (total, log_vars)
    (reference: base.py:185 _parse_losses)."""
    log_vars = {}
    total = jnp.zeros((), jnp.float32)
    for name, value in losses.items():
        value = jnp.sum(jnp.asarray(value, jnp.float32))
        log_vars[name] = value
        if 'loss' in name:
            total = total + value
    log_vars['loss'] = total
    return total, log_vars


def make_train_step(module, tx: optax.GradientTransformation,
                    ema_momentum: Optional[float] = None,
                    with_grads: bool = False) -> Callable:
    """Build the pure (state, batch, rng) → (state, metrics) step.

    ``batch`` keys: img, img_shapes, pad_shapes, gt_bboxes, gt_valid,
    gt_labels[, gt_masks] (all statically shaped, padded).

    ``ema_momentum`` enables per-iteration EMA tracking of params
    (reference mmcv EMAHook semantics:
    ema = (1 - momentum) * ema + momentum * param, momentum ≈ 0.0002).

    ``with_grads`` adds the raw (pre-optimizer, cross-device-averaged)
    gradient tree to the metrics under 'grads' — debug/testing only
    (the DP-equivalence suite pins the collective at ~1e-6 with it)."""

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jnp.ndarray):
        step_rng = jax.random.fold_in(rng, state.step)
        samp_rng, drop_rng = jax.random.split(step_rng)
        mutable = list(state.model_state.keys())

        def loss_fn(params):
            variables = {'params': params, **state.model_state}
            args = (batch['img'], batch['img_shapes'], batch['pad_shapes'],
                    batch['gt_bboxes'], batch['gt_valid'],
                    batch['gt_labels'], batch.get('gt_masks'))
            if 'gt_semantic_seg' in batch:   # HTC semantic branch
                args = args + (batch['gt_semantic_seg'],)
            rngs = {'sampling': samp_rng, 'dropout': drop_rng}
            if mutable:
                losses, new_ms = module.apply(
                    variables, *args, method='forward_train', rngs=rngs,
                    mutable=mutable)
            else:
                losses = module.apply(variables, *args,
                                      method='forward_train', rngs=rngs)
                new_ms = state.model_state
            total, log_vars = parse_losses(losses)
            return total, (log_vars, new_ms)

        (_, (log_vars, new_ms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None and ema_momentum is not None:
            m = jnp.asarray(ema_momentum, jnp.float32)
            ema = jax.tree_util.tree_map(
                lambda e, p: ((1.0 - m) * e.astype(jnp.float32)
                              + m * p.astype(jnp.float32)).astype(e.dtype),
                ema, params)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, model_state=new_ms,
                                  ema_params=ema)
        log_vars['grad_norm'] = optax.global_norm(grads)
        if with_grads:
            log_vars['grads'] = grads
        return new_state, log_vars

    return train_step


def jit_train_step(train_step: Callable, mesh: Mesh) -> Callable:
    """jit the step over the mesh: state replicated, batch sharded over
    ``data``, donated state buffer (reference's DDP+apex path collapses
    into these in_shardings)."""
    rep = replicated(mesh)
    dat = data_sharded(mesh)

    def batch_sharding(batch):
        return {k: dat for k in batch}

    return jax.jit(
        train_step,
        in_shardings=(rep, None, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,))
