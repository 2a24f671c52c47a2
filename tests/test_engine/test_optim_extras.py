"""Gradient accumulation (update_interval), EMA tracking, save_best, and
sanity-rail tests (reference: mmdet/utils/optimizer.py:9
DistOptimizerHook, mmcv EMAHook / EvalHook save_best,
mmdet/datasets/utils.py:115 NumClassCheckHook)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from swindet_tpu.engine import build_lr_schedule, build_optimizer
from swindet_tpu.engine.train_step import TrainState


def _toy_params(key=0):
    k = jax.random.PRNGKey(key)
    return {'w': jax.random.normal(k, (4, 3)), 'b': jnp.zeros(3)}


def _toy_grad(params, x, y):
    def loss(p):
        pred = x @ p['w'] + p['b']
        return jnp.mean((pred - y) ** 2)
    return jax.grad(loss)(params)


def test_update_interval_matches_big_batch():
    """k accumulation steps on k shards == 1 step on the full batch."""
    sched = build_lr_schedule(dict(policy='fixed'), base_lr=1e-2,
                              iters_per_epoch=10)
    cfg = dict(type='SGD', lr=1e-2, momentum=0.9, weight_decay=1e-4)
    params = _toy_params()

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 4), jnp.float32)
    y = jnp.asarray(rng.randn(8, 3), jnp.float32)

    # big-batch reference: one step with the full-batch (mean) gradient
    tx_big = build_optimizer(params, cfg, sched)
    st_big = tx_big.init(params)
    g = _toy_grad(params, x, y)
    upd, _ = tx_big.update(g, st_big, params)
    p_big = optax.apply_updates(params, upd)

    # accumulated: k=4 shards of 2, one optimizer update on the 4th
    tx_acc = build_optimizer(params, cfg, sched, update_interval=4)
    st_acc = tx_acc.init(params)
    p_acc = params
    for i in range(4):
        gi = _toy_grad(p_acc, x[2 * i:2 * i + 2], y[2 * i:2 * i + 2])
        upd, st_acc = tx_acc.update(gi, st_acc, p_acc)
        p_acc = optax.apply_updates(p_acc, upd)
        if i < 3:  # params frozen until the k-th micro-step
            np.testing.assert_allclose(np.asarray(p_acc['w']),
                                       np.asarray(params['w']))

    np.testing.assert_allclose(np.asarray(p_acc['w']),
                               np.asarray(p_big['w']), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_acc['b']),
                               np.asarray(p_big['b']), atol=1e-6)


def test_update_interval_lr_schedule_in_iteration_units():
    """With k=4, warmup_iters counts ITERATIONS, not optimizer updates."""
    sched = build_lr_schedule(
        dict(policy='step', warmup='linear', warmup_iters=8,
             warmup_ratio=0.5, step=[100]),
        base_lr=1.0, iters_per_epoch=10)
    params = {'w': jnp.ones(2)}
    tx = build_optimizer(params, dict(type='SGD', lr=1.0), sched,
                         update_interval=4)
    st = tx.init(params)
    g = {'w': jnp.ones(2)}
    # first optimizer update fires at micro-step 4 == inner count 0 →
    # schedule sees iteration 0 (warmup start, lr = 0.5)
    p = params
    for _ in range(4):
        upd, st = tx.update(g, st, p)
        p = optax.apply_updates(p, upd)
    np.testing.assert_allclose(np.asarray(params['w'] - p['w']),
                               0.5 * np.ones(2), atol=1e-6)
    # second update: inner count 1 → iteration 4 → lr = 0.5 + 4/8*0.5
    p2 = p
    for _ in range(4):
        upd, st = tx.update(g, st, p2)
        p2 = optax.apply_updates(p2, upd)
    np.testing.assert_allclose(np.asarray(p['w'] - p2['w']),
                               0.75 * np.ones(2), atol=1e-6)


def test_ema_tracking():
    """EMA follows mmcv EMAHook: ema = (1-m)*ema + m*param."""
    from swindet_tpu.engine.train_step import make_train_step

    params = {'w': jnp.ones(3)}
    st = TrainState.create(params, optax.sgd(0.1), with_ema=True)
    assert st.ema_params is not None
    np.testing.assert_allclose(np.asarray(st.ema_params['w']),
                               np.asarray(params['w']))

    # drive the EMA arithmetic directly (module-free): one manual step
    m = 0.1
    new_params = {'w': jnp.full(3, 2.0)}
    ema = jax.tree_util.tree_map(
        lambda e, p: (1 - m) * e + m * p, st.ema_params, new_params)
    np.testing.assert_allclose(np.asarray(ema['w']), 1.1 * np.ones(3),
                               rtol=1e-6)
    # make_train_step accepts the knob
    assert callable(make_train_step)


def test_save_best_tracking(tmp_path):
    from swindet_tpu.engine.runner import EpochBasedRunner

    class Logger:
        def info(self, *a, **k):
            pass

    saved = []

    def save_fn(path, state, meta):
        os.makedirs(path, exist_ok=True)
        saved.append((os.path.basename(path), meta.get('best_score')))

    r = EpochBasedRunner(train_step=None, mesh=None,
                         work_dir=str(tmp_path), logger=Logger(),
                         max_epochs=3, save_fn=save_fn,
                         save_best='bbox_mAP')
    assert r.save_best_rule == 'greater'
    r.epoch = 1
    r._maybe_save_best(None, dict(bbox_mAP=0.3))
    r.epoch = 2
    r._maybe_save_best(None, dict(bbox_mAP=0.2))   # worse — no save
    r.epoch = 3
    r._maybe_save_best(None, dict(bbox_mAP=0.4))
    assert [s[0] for s in saved] == ['best_bbox_mAP_epoch_1',
                                     'best_bbox_mAP_epoch_3']
    link = os.path.join(str(tmp_path), 'best_bbox_mAP')
    assert os.path.islink(link)
    assert os.readlink(link) == 'best_bbox_mAP_epoch_3'
    # stale best dir pruned
    assert not os.path.exists(
        os.path.join(str(tmp_path), 'best_bbox_mAP_epoch_1'))

    # 'auto' rule flips for loss keys
    r2 = EpochBasedRunner(train_step=None, mesh=None,
                          work_dir=str(tmp_path), logger=Logger(),
                          max_epochs=1, save_fn=save_fn,
                          save_best='val_loss')
    assert r2.save_best_rule == 'less'


def test_num_class_check():
    from swindet_tpu.utils import check_num_classes

    class DS:
        CLASSES = ('a', 'b', 'c')

    # matching head passes (RPN's num_classes=1 tolerated alongside)
    check_num_classes(
        dict(roi_head=dict(bbox_head=dict(num_classes=3)),
             rpn_head=dict(num_classes=1)), DS())
    with pytest.raises(ValueError, match='num_classes mismatch'):
        check_num_classes(
            dict(bbox_head=dict(num_classes=80)), DS())
    # no CLASSES → skip silently
    check_num_classes(dict(bbox_head=dict(num_classes=80)), object())
