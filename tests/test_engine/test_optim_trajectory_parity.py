"""Optimizer-TRAJECTORY parity vs torch (VERDICT r4 ask #1): the last
untested link between a matched gradient and a matched trained model.

Three layers:

1. Unit adversarial AdamW semantics (fp64, toy tree): zero grad + weight
   decay, clip engaged/not engaged (incl. torch's ``+1e-6`` denominator),
   lr=0 warmup step (moments must still advance), decay_mult=0 /
   lr_mult custom keys — optax chain vs torch.optim.AdamW bit-for-bit
   (rel < 1e-12).
2. Multi-step trajectory on a REAL model: 10 full optimizer steps of the
   tiny Swin Mask R-CNN (AdamW + grad clip + linear warmup + step decay
   + the flagship's paramwise custom_keys) in fp64. Per-step gradients
   come from torch autograd at the CURRENT params and are mapped onto
   the flax tree by the production converter (exact for fp64: the
   layout permutations are index permutations); gradient-COMPUTATION
   parity is pinned separately by test_grad_parity.py, so this test
   isolates the update path: clip -> Adam moments/bias correction ->
   decoupled wd with decay_mult -> lr_mult -> schedule. Param trees must
   agree per-param to rel < 1e-6 after every one of the 10 steps.
3. Flagship partition: the decay_mult=0 key matching over the REAL
   Swin-T Mask R-CNN param tree must reproduce exactly the torch
   param-group partition the reference's DefaultOptimizerConstructor
   builds (reference: mmdet/apis/train.py:79 build_optimizer,
   configs/swin/mask_rcnn_swin_tiny_patch4_window7_mstrain_480-800_
   adamw_1x_coco.py:64-67 custom_keys, mmcv DefaultOptimizerConstructor
   sorted-keys substring matching).
"""
import copy

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from tests.test_golden import refbridge
from tests.test_golden.common import (build_both, make_gts, make_image,
                                      tiny_maskrcnn_cfg)

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')

CUSTOM_KEYS = {
    'absolute_pos_embed': dict(decay_mult=0.),
    'relative_position_bias_table': dict(decay_mult=0.),
    'norm': dict(decay_mult=0.),
}


# ------------------------------------------------------------------
# torch-side reference optimizer machinery (mmcv semantics, test-local)
# ------------------------------------------------------------------
def mmcv_match(name, custom_keys):
    """mmcv DefaultOptimizerConstructor: keys sorted alphabetically then
    stable-sorted by length descending; first (= longest) substring
    match wins."""
    for key in sorted(sorted(custom_keys), key=len, reverse=True):
        if key in name:
            c = custom_keys[key]
            return (float(c.get('decay_mult', 1.0)),
                    float(c.get('lr_mult', 1.0)))
    return 1.0, 1.0


def torch_build_optimizer(model, base_lr, weight_decay, betas=(0.9, 0.999),
                          eps=1e-8, custom_keys=None):
    groups = []
    for name, p in model.named_parameters():
        if not p.requires_grad:
            continue
        dm, lm = mmcv_match(name, custom_keys or {})
        groups.append(dict(params=[p], lr=base_lr * lm,
                           weight_decay=weight_decay * dm,
                           initial_lr=base_lr * lm))
    return torch.optim.AdamW(groups, lr=base_lr, betas=betas, eps=eps,
                             weight_decay=weight_decay)


def py_lr_factor(t, warmup_iters, warmup_ratio, boundaries, gamma):
    """mmcv StepLrUpdaterHook + linear warmup, as a python-float factor
    relative to base lr (applied per group on top of lr_mult)."""
    n = sum(t >= b for b in boundaries)
    reg = gamma ** n
    if t < warmup_iters:
        frac = t / warmup_iters
        return reg * (warmup_ratio + (1.0 - warmup_ratio) * frac)
    return reg


def torch_sgd_like_step(opt, model, max_norm, lr_factor):
    """One reference iteration: set group lrs (LrUpdaterHook
    before_train_iter), clip (OptimizerHook.clip_grads -> torch
    clip_grad_norm_), step."""
    for g in opt.param_groups:
        g['lr'] = g['initial_lr'] * lr_factor
    if max_norm is not None:
        torch.nn.utils.clip_grad_norm_(
            [p for p in model.parameters()
             if p.requires_grad and p.grad is not None], max_norm)
    opt.step()


# ------------------------------------------------------------------
# 1. unit adversarial semantics, toy tree, fp64
# ------------------------------------------------------------------
class _ToyNames:
    """Parameter names chosen to exercise custom_keys matching."""
    WEIGHT = 'backbone.layers.0.blocks.0.mlp.fc1.weight'
    NORM_W = 'backbone.layers.0.blocks.0.norm1.weight'
    BIAS_TABLE = ('backbone.layers.0.blocks.0.attn.'
                  'relative_position_bias_table')


def _toy_torch_model(vals):
    model = torch.nn.Module()
    params = {}
    for name, v in vals.items():
        p = torch.nn.Parameter(torch.tensor(v, dtype=torch.float64))
        params[name] = p
    model._toy = params

    def named_parameters():
        return list(params.items())
    model.named_parameters = named_parameters
    model.parameters = lambda: [p for _, p in named_parameters()]
    return model


def _optax_chain_fp64(params_np, base_lr, wd, grad_clip, lr_fn,
                      custom_keys):
    from swindet_tpu.engine.optimizer import build_optimizer

    class _P:
        pass

    # name the leaves so build_multiplier_trees' path->torch-key map
    # reproduces the torch names: use a dict tree whose keys round-trip
    # through flax_path_to_torch_key
    cfg = dict(type='AdamW', lr=base_lr, betas=(0.9, 0.999),
               weight_decay=wd,
               paramwise_cfg=dict(custom_keys=custom_keys))
    return build_optimizer(params_np, cfg, lr_fn, grad_clip=grad_clip)


def _tree_from_names(vals):
    """'a.b.c.weight' names -> nested dict tree with flax leaf names."""
    tree = {}
    for name, v in vals.items():
        parts = name.split('.')
        # invert flax_path_to_torch_key's indexed-segment split:
        # 'layers','0' -> 'layers0'; leaf 'weight' -> 'kernel'/'scale'
        path = []
        i = 0
        while i < len(parts) - 1:
            if i + 1 < len(parts) - 1 and parts[i + 1].isdigit():
                path.append(parts[i] + parts[i + 1])
                i += 2
            else:
                path.append(parts[i])
                i += 1
        leaf = parts[-1]
        if leaf == 'weight':
            leaf = 'scale' if 'norm' in path[-1] else 'kernel'
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = np.asarray(v, np.float64)
    return tree


def _collect_leaves(tree, names):
    """Flatten back to torch-name -> value using the production
    path->key mapping."""
    from swindet_tpu.checkpoint import _flatten, flax_path_to_torch_key
    out = {}
    for path, leaf in _flatten(tree).items():
        out[flax_path_to_torch_key(path)] = np.asarray(leaf)
    return {n: out[n] for n in names}


@pytest.mark.parametrize('case', ['zero_grad_wd', 'clip_engaged',
                                  'warmup_lr0', 'no_clip'])
def test_adamw_unit_semantics(case):
    """optax chain vs torch.optim.AdamW on adversarial fp64 cases."""
    rs = np.random.RandomState(0)
    vals = {
        _ToyNames.WEIGHT: rs.randn(4, 3),
        _ToyNames.NORM_W: rs.randn(5),
        _ToyNames.BIAS_TABLE: rs.randn(7, 2),
    }
    # torch kernel layout (out,in) vs flax (in,out): transpose the 2-D
    # weight for the flax tree; grads transpose identically
    grads = {n: (np.zeros_like(v) if case == 'zero_grad_wd'
                 else rs.randn(*np.shape(v)) * 3.0)
             for n, v in vals.items()}
    base_lr, wd = 1e-2, 0.05
    max_norm = None if case == 'no_clip' else \
        (1e-3 if case == 'clip_engaged' else 1e6)
    warmup = case == 'warmup_lr0'

    # --- torch side
    model = _toy_torch_model(vals)
    opt = torch_build_optimizer(model, base_lr, wd,
                                custom_keys=CUSTOM_KEYS)
    # --- optax side (fp64 under the x64 context)
    with jax.enable_x64():
        tree = _tree_from_names({
            n: (v.T if n == _ToyNames.WEIGHT else v)
            for n, v in vals.items()})
        gtree = _tree_from_names({
            n: (g.T if n == _ToyNames.WEIGHT else g)
            for n, g in grads.items()})

        def lr_fn(step):
            if warmup:
                # linear warmup with ratio 0: lr == 0 exactly at step 0
                return base_lr * jnp.minimum(
                    jnp.asarray(step, jnp.float64) / 10.0, 1.0)
            return jnp.asarray(base_lr, jnp.float64)

        tx = _optax_chain_fp64(
            tree, base_lr, wd,
            dict(max_norm=max_norm) if max_norm is not None else None,
            lr_fn, CUSTOM_KEYS)
        opt_state = tx.init(tree)

        for t in range(3):
            # torch
            for name, p in model.named_parameters():
                p.grad = torch.tensor(grads[name], dtype=torch.float64)
            fac = (min(t / 10.0, 1.0) if warmup else 1.0)
            torch_sgd_like_step(opt, model, max_norm, fac)
            # optax
            updates, opt_state = tx.update(gtree, opt_state, tree)
            tree = optax.apply_updates(tree, updates)

        got = _collect_leaves(tree, list(vals))
        for name, p in model.named_parameters():
            want = p.detach().numpy()
            g = got[name].T if name == _ToyNames.WEIGHT else got[name]
            scale = max(np.abs(want).max(), 1e-12)
            err = np.abs(g - want).max() / scale
            assert err < 1e-12, f'{case}/{name}: rel err {err:.2e}'
        if case == 'warmup_lr0':
            # step 0 had lr=0: params must have been UNCHANGED after it,
            # but moments advanced — verified implicitly by later-step
            # agreement with torch (torch also advances moments at lr=0)
            pass
        if case == 'zero_grad_wd':
            # decoupled wd must still shrink kernel weights but leave
            # decay_mult=0 (norm / bias-table) params untouched
            assert np.abs(got[_ToyNames.NORM_W]
                          - vals[_ToyNames.NORM_W]).max() < 1e-14
            assert np.abs(got[_ToyNames.BIAS_TABLE]
                          - vals[_ToyNames.BIAS_TABLE]).max() < 1e-14
            assert np.abs(got[_ToyNames.WEIGHT].T
                          - vals[_ToyNames.WEIGHT]).max() > 1e-5


# ------------------------------------------------------------------
# 2. ten-step trajectory on the tiny Swin Mask R-CNN, fp64
# ------------------------------------------------------------------
def _ref_grads_fp64(ref, imgs, gt_bboxes, gt_valid, gt_labels, masks):
    """forward_train + backward in double precision; grads stay on the
    model (for torch clip+step) and are also returned as a state_dict-
    shaped fp64 dict for the converter."""
    ref.train()
    b, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    t_img = torch.from_numpy(
        np.ascontiguousarray(imgs.transpose(0, 3, 1, 2))).double()
    metas = [dict(img_shape=(h, w, 3), pad_shape=(h, w, 3),
                  ori_shape=(h, w, 3),
                  scale_factor=np.array([1., 1., 1., 1.], np.float32),
                  flip=False, flip_direction=None) for _ in range(b)]
    t_boxes = [torch.tensor(gt_bboxes[i][gt_valid[i]]).double()
               for i in range(b)]
    t_labels = [torch.tensor(gt_labels[i][gt_valid[i]].astype(np.int64))
                for i in range(b)]
    kwargs = {}
    if masks is not None:
        from mmdet.core.mask.structures import BitmapMasks
        kwargs['gt_masks'] = [
            BitmapMasks(masks[i][gt_valid[i]].astype(np.uint8), h, w)
            for i in range(b)]
    losses = ref.forward_train(t_img, metas, t_boxes, t_labels, **kwargs)
    total = None
    for k, v in losses.items():
        if 'loss' not in k:
            continue
        vs = v if isinstance(v, (list, tuple)) else [v]
        part = sum(x.mean() for x in vs)
        total = part if total is None else total + part
    ref.zero_grad()
    total.backward()
    grads = {}
    for name, p in ref.named_parameters():
        grads[name] = (p.grad.detach().clone().numpy()
                       if p.grad is not None
                       else np.zeros(p.shape, np.float64))
    return grads


@pytest.mark.slow
def test_optim_trajectory_parity_tiny_maskrcnn():
    from swindet_tpu.checkpoint import (_flatten, convert_torch_state_dict,
                                        default_flatten_hints,
                                        flax_path_to_torch_key)
    from swindet_tpu.engine.optimizer import build_optimizer
    from swindet_tpu.engine.schedules import build_lr_schedule

    cfg = tiny_maskrcnn_cfg(with_mask=True)
    # exhaustive samplers: deterministic assignment in both frameworks
    cfg = copy.deepcopy(cfg)
    cfg['train_cfg']['rpn']['sampler']['num'] = 2048
    cfg['train_cfg']['rcnn']['sampler']['num'] = 128
    h, w = 64, 96
    ref, module, variables = build_both(cfg, img_hw=(h, w), seed=3)
    ref = ref.double()
    imgs = np.stack([make_image(h, w, seed=i) for i in range(2)])
    gt_bboxes, gt_valid, gt_labels, masks = make_gts(
        2, 3, h, w, num_classes=4, seed=0, with_mask=True)

    base_lr, wd, max_norm = 1e-3, 0.05, 1.0
    warmup_iters, warmup_ratio, gamma = 4, 0.001, 0.1
    iters_per_epoch, steps_ep = 3, [2]     # decay boundary at iter 6
    boundaries = [s * iters_per_epoch for s in steps_ep]
    hints = default_flatten_hints(cfg)

    t_opt = torch_build_optimizer(ref, base_lr, wd,
                                  custom_keys=CUSTOM_KEYS)

    with jax.enable_x64():
        template = jax.tree_util.tree_map(
            lambda x: np.zeros(x.shape, np.float64), variables['params'])
        params, rep = convert_torch_state_dict(
            {k: v for k, v in ref.state_dict().items()}, template,
            flatten_hints=hints)
        assert not rep['missing'] and not rep['unexpected']

        lr_fn = build_lr_schedule(
            dict(policy='step', warmup='linear',
                 warmup_iters=warmup_iters, warmup_ratio=warmup_ratio,
                 step=steps_ep, gamma=gamma),
            base_lr, iters_per_epoch)
        tx = build_optimizer(
            template,
            dict(type='AdamW', lr=base_lr, betas=(0.9, 0.999),
                 weight_decay=wd,
                 paramwise_cfg=dict(custom_keys=CUSTOM_KEYS)),
            lr_fn, grad_clip=dict(max_norm=max_norm, norm_type=2))
        opt_state = tx.init(params)

        worst = 0.0
        for t in range(10):
            grads = _ref_grads_fp64(ref, imgs, gt_bboxes, gt_valid,
                                    gt_labels, masks)
            gtree, grep = convert_torch_state_dict(grads, template,
                                                   flatten_hints=hints)
            assert not grep['unexpected']
            fac = py_lr_factor(t, warmup_iters, warmup_ratio,
                               boundaries, gamma)
            torch_sgd_like_step(t_opt, ref, max_norm, fac)
            updates, opt_state = tx.update(gtree, opt_state, params)
            params = optax.apply_updates(params, updates)

            # compare the FULL param trees after this step
            t_tree, _ = convert_torch_state_dict(
                {k: v for k, v in ref.state_dict().items()}, template,
                flatten_hints=hints)
            ft, fj = _flatten(t_tree), _flatten(params)
            for path, tv in ft.items():
                jv = np.asarray(fj[path], np.float64)
                tv = np.asarray(tv, np.float64)
                scale = max(np.abs(tv).max(), 1e-8)
                err = np.abs(tv - jv).max() / scale
                worst = max(worst, err)
                assert err < 1e-6, (
                    f'step {t} {flax_path_to_torch_key(path)}: '
                    f'rel err {err:.3e}')
        # the trajectory genuinely moved (not a frozen-model tautology)
        f0 = _flatten(variables['params'])
        moved = max(
            np.abs(np.asarray(v, np.float64)
                   - np.asarray(f0[p], np.float64)).max()
            for p, v in _flatten(params).items())
        assert moved > 1e-5
        print(f'trajectory worst per-param rel err over 10 steps: '
              f'{worst:.2e}')


# ------------------------------------------------------------------
# 3. flagship param-tree partition
# ------------------------------------------------------------------
@pytest.mark.slow
def test_flagship_custom_keys_partition():
    """decay_mult=0 matching over the REAL Swin-T Mask R-CNN tree must
    reproduce the torch param-group partition exactly."""
    from swindet_tpu.utils.config import Config
    from swindet_tpu.models import build_detector
    from swindet_tpu.engine.optimizer import build_multiplier_trees
    from swindet_tpu.checkpoint import _flatten, flax_path_to_torch_key

    cfg = Config.fromfile(
        'configs/swin/mask_rcnn_swin_tiny_patch4_window7_mstrain_'
        '480-800_adamw_1x_coco.py')
    custom_keys = {k: dict(v) for k, v in
                   cfg.optimizer['paramwise_cfg']['custom_keys'].items()}

    module = build_detector(copy.deepcopy(cfg.model))
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda d: module.init({'params': jax.random.PRNGKey(0)}, d,
                              method='forward_dummy'), dummy)
    params = shapes['params']
    decay_tree, lr_tree = build_multiplier_trees(params, dict(
        custom_keys=custom_keys))

    refbridge.install()
    ref = refbridge.build_ref_detector(copy.deepcopy(cfg.model))
    torch_names = {n for n, p in ref.named_parameters()
                   if p.requires_grad}

    fd, fl = _flatten(decay_tree), _flatten(lr_tree)
    ours_names = set()
    n_zero = 0
    for path in _flatten(params):
        tkey = flax_path_to_torch_key(path)
        ours_names.add(tkey)
        want_dm, want_lm = mmcv_match(tkey, custom_keys)
        assert fd[path] == want_dm, \
            f'{tkey}: decay_mult {fd[path]} != torch {want_dm}'
        assert fl[path] == want_lm, \
            f'{tkey}: lr_mult {fl[path]} != torch {want_lm}'
        n_zero += want_dm == 0.0
    # same name universe => same param-group partition
    assert ours_names == torch_names, (
        f'only-ours: {sorted(ours_names - torch_names)[:8]} '
        f'only-torch: {sorted(torch_names - ours_names)[:8]}')
    # sanity: the no-decay set is the documented one and non-trivial
    assert n_zero > 50
