"""Config/dataset sanity rails (reference: NumClassCheckHook at
mmdet/datasets/utils.py:115 and mmcv's NaN-debug practice).

TPU-native: the check runs once at bind time on the host (no hook
machinery needed), and NaN debugging maps to ``jax_debug_nans`` which
makes XLA re-run the offending primitive un-jitted and raise at the
exact op.
"""
from __future__ import annotations

from typing import Optional


def _head_num_classes(model_cfg: dict):
    """Collect every ``num_classes`` declared by the model's heads."""
    found = []

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == 'num_classes':
                    found.append(int(v))
                else:
                    walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(dict(model_cfg))
    return found


def check_num_classes(model_cfg: dict, dataset, logger=None) -> None:
    """Compare the model heads' ``num_classes`` against
    ``len(dataset.CLASSES)`` (reference: NumClassCheckHook._check_head,
    mmdet/datasets/utils.py:131). Raises on mismatch — on TPU a silent
    mismatch would train to garbage for a full (expensive) run.
    """
    classes = getattr(dataset, 'CLASSES', None)
    if classes is None:
        if logger:
            logger.warning(
                'Dataset has no CLASSES; skipping num_classes check')
        return
    n = len(classes)
    declared = _head_num_classes(model_cfg)
    bad = [d for d in declared if d != n]
    # RPN heads legitimately declare 1 class; only flag when NO declared
    # head matches the dataset (mirrors the reference's per-head check
    # while tolerating class-agnostic heads).
    if declared and bad and not any(d == n for d in declared):
        raise ValueError(
            f'num_classes mismatch: model declares {sorted(set(declared))} '
            f'but dataset has {n} classes ({classes[:5]}...). '
            f'Fix model.*.num_classes or dataset classes '
            f'(reference: NumClassCheckHook).')


def enable_debug_nans(enable: bool = True) -> None:
    """Map the reference's NaN-hunting workflow onto JAX: with
    ``jax_debug_nans`` XLA re-runs the offending computation op-by-op
    and raises FloatingPointError at the first NaN-producing primitive.
    """
    import jax
    jax.config.update('jax_debug_nans', bool(enable))
