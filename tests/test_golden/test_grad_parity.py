"""GRADIENT golden parity: jax.grad of the total forward_train loss vs
torch autograd through the reference models on identical weights and
inputs (VERDICT r3 ask #2 — training is the reference's production path,
mmdet/apis/train.py loss.backward).

RNG is killed with the exhaustive-sampler trick: RandomSampler ``num``
is raised above the candidate count so both frameworks deterministically
take every positive and negative (reference random_sampler.py falls back
to 'take all' when num_expected >= available).

Torch grads are mapped onto the flax tree by the production .pth
converter — its weight layout permutations (OIHW→HWIO, (out,in)→(in,out),
CHW→HWC first-FC reorder, deconv flip) are linear index permutations, so
they transform gradients exactly like weights.

Covered families (per the VERDICT list): Mask R-CNN (RPN+RoI+mask,
RoIAlign strip-DMA backward), Cascade R-CNN (stage detach boundaries),
RetinaNet (focal), RepPoints (deform-conv VJP + stop_gradient'd first
stage), VFNet (star deform + ATSS branch), GA-Retina (FeatureAdaption
stop_gradient + MaskedConv).
"""
import copy

import numpy as np
import pytest

from tests.test_golden import refbridge
from tests.test_golden.common import (grad_parity, tiny_cascade_cfg,
                                      tiny_maskrcnn_cfg)

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')

HW = (64, 96)


def _exhaustive_two_stage(cfg):
    """Raise sampler capacities above candidate counts: ~1536 anchors at
    64x96 (strides 4..64, 3 anchors) and 100 proposals + gts."""
    cfg = copy.deepcopy(cfg)
    cfg['train_cfg']['rpn']['sampler']['num'] = 2048
    rcnn = cfg['train_cfg']['rcnn']
    for st in (rcnn if isinstance(rcnn, list) else [rcnn]):
        st['sampler']['num'] = 128
    return cfg


def test_grad_parity_mask_rcnn():
    cfg = _exhaustive_two_stage(tiny_maskrcnn_cfg(with_mask=True))
    grad_parity(cfg, img_hw=HW, with_mask=True)


def test_grad_parity_cascade():
    cfg = _exhaustive_two_stage(tiny_cascade_cfg(with_mask=False))
    grad_parity(cfg, img_hw=HW, with_mask=False)


def test_grad_parity_retinanet():
    from tests.test_golden.test_e2e_single_stage_parity import \
        tiny_retinanet_cfg
    grad_parity(tiny_retinanet_cfg(), img_hw=HW)


def test_grad_parity_fcos():
    from tests.test_golden.test_e2e_single_stage_parity import \
        tiny_fcos_cfg
    grad_parity(tiny_fcos_cfg(), img_hw=HW)


def test_grad_parity_reppoints():
    from tests.test_golden.test_e2e_single_stage_parity3 import \
        tiny_reppoints_cfg
    # atol floor: the deform-conv bilinear VJP's derivative is
    # discontinuous at integer grid lines, so fp32 forward noise can
    # flip a sampling cell and perturb grads absolutely (observed
    # <= 1e-5 on ~1e-3-scale tensors; loss values and every other
    # family match at rel 1e-4)
    grad_parity(tiny_reppoints_cfg('moment'), img_hw=HW, atol=2e-5)


def test_grad_parity_vfnet():
    from tests.test_golden.test_e2e_vfnet_parity import tiny_vfnet_cfg
    grad_parity(tiny_vfnet_cfg(use_atss=True), img_hw=HW)


def test_grad_parity_ga_retina():
    from tests.test_golden.test_e2e_single_stage_parity5 import \
        tiny_ga_retina_cfg
    grad_parity(tiny_ga_retina_cfg(), img_hw=HW)


def test_grad_parity_atss():
    from tests.test_golden.test_e2e_single_stage_parity2 import \
        tiny_atss_cfg
    grad_parity(tiny_atss_cfg(), img_hw=HW)


def test_grad_parity_gfl():
    from tests.test_golden.test_e2e_single_stage_parity2 import \
        tiny_gfl_cfg
    grad_parity(tiny_gfl_cfg(), img_hw=HW)


def test_grad_parity_detr():
    """Transformer backward + Hungarian assignment (deterministic)."""
    from tests.test_golden.test_e2e_detr_parity import tiny_detr_cfg
    grad_parity(tiny_detr_cfg(), img_hw=HW)


def test_grad_parity_sparse_rcnn():
    """6-stage DII head: per-stage Hungarian assignment (deterministic),
    dynamic-conv instance interaction, proposal-box stop_gradients
    between stages — plus the LN-eps surface this harness caught for
    DETR."""
    from tests.test_golden.test_e2e_sparse_rcnn_parity import \
        tiny_sparse_rcnn_cfg
    # atol floor: attention k-proj bias grads are mathematically zero
    # (softmax is invariant to a constant shift of all key logits), so
    # both sides compute ~1e-7 fp dust on a null direction
    grad_parity(tiny_sparse_rcnn_cfg(), img_hw=HW, atol=1e-6)


def test_grad_parity_cascade_mask():
    """Cascade Mask R-CNN: stage detaches + per-stage mask branch."""
    cfg = _exhaustive_two_stage(tiny_cascade_cfg(with_mask=True))
    grad_parity(cfg, img_hw=HW, with_mask=True)
