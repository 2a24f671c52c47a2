"""Golden parity: swindet Swin/FPN vs the REFERENCE torch implementation
(mmdet/models/backbones/swin_transformer.py run via pure-torch shims).

Covers: patchify, window partition/shift masks at non-multiple sizes,
relative-position bias, patch merging, per-stage LN, FPN fusion, and the
.pth converter on a real (tiny) architecture.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from . import refbridge
from .common import (build_both, make_image, tiny_swin_backbone_cfg,
                     transfer_weights)

pytestmark = pytest.mark.skipif(not refbridge.reference_available(),
                                reason='reference checkout not mounted')


def _build_backbones(backbone_cfg, hw):
    refbridge.install()
    import copy
    from mmdet.models import build_backbone as ref_build_backbone
    from mmcv.utils import ConfigDict
    torch.manual_seed(0)
    ref = ref_build_backbone(ConfigDict(copy.deepcopy(backbone_cfg)))
    ref.init_weights()
    ref.eval()

    from swindet_tpu.models import build_backbone
    from swindet_tpu.utils import jit_init
    module = build_backbone(copy.deepcopy(backbone_cfg))
    dummy = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
    variables = jit_init(module, {'params': jax.random.PRNGKey(0)}, dummy)
    variables = transfer_weights(ref, variables)
    return ref, module, variables


@pytest.mark.parametrize('hw', [(64, 64), (60, 92)])
def test_tiny_swin_stage_parity(hw):
    """Per-stage activation parity, incl. a non-window-multiple size that
    exercises padding + shifted-window masks (reference
    swin_transformer.py:214-246,370-389)."""
    cfg = tiny_swin_backbone_cfg()
    ref, module, variables = _build_backbones(cfg, hw)
    img = make_image(*hw, seed=3)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(
            np.ascontiguousarray(img.transpose(2, 0, 1))[None]))
    jax_outs = module.apply(variables, jnp.asarray(img)[None])
    assert len(ref_outs) == len(jax_outs) == 4
    for i, (r, j) in enumerate(zip(ref_outs, jax_outs)):
        r = r.numpy()[0].transpose(1, 2, 0)  # CHW → HWC
        j = np.asarray(j[0])
        assert r.shape == j.shape, f'stage {i}: {r.shape} vs {j.shape}'
        np.testing.assert_allclose(j, r, atol=1e-3, rtol=1e-3,
                                   err_msg=f'stage {i}')


def test_tiny_swin_ape_parity():
    """Absolute position embedding path (bicubic resize at trace time,
    reference swin_transformer.py:605-608)."""
    cfg = tiny_swin_backbone_cfg(ape=True)
    cfg['pretrain_img_size'] = 32
    ref, module, variables = _build_backbones(cfg, (64, 64))
    img = make_image(64, 64, seed=5)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(
            np.ascontiguousarray(img.transpose(2, 0, 1))[None]))
    jax_outs = module.apply(variables, jnp.asarray(img)[None])
    for i, (r, j) in enumerate(zip(ref_outs, jax_outs)):
        r = r.numpy()[0].transpose(1, 2, 0)
        np.testing.assert_allclose(np.asarray(j[0]), r, atol=2e-3,
                                   rtol=1e-3, err_msg=f'stage {i}')


def test_real_arch_swin_t_parity():
    """FULL Swin-T architecture (embed_dim 96, depths 2/2/6/2, heads
    3/6/12/24, window 7) on a small image — exercises the converter at
    production dimensions (qkv packing, bias tables, patch merging)."""
    cfg = dict(type='SwinTransformer', embed_dim=96, depths=[2, 2, 6, 2],
               num_heads=[3, 6, 12, 24], window_size=7, mlp_ratio=4.0,
               qkv_bias=True, drop_path_rate=0.0, ape=False,
               patch_norm=True, out_indices=(0, 1, 2, 3))
    ref, module, variables = _build_backbones(cfg, (96, 128))
    img = make_image(96, 128, seed=7)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(
            np.ascontiguousarray(img.transpose(2, 0, 1))[None]))
    jax_outs = module.apply(variables, jnp.asarray(img)[None])
    for i, (r, j) in enumerate(zip(ref_outs, jax_outs)):
        r = r.numpy()[0].transpose(1, 2, 0)
        np.testing.assert_allclose(np.asarray(j[0]), r, atol=2e-3,
                                   rtol=1e-3, err_msg=f'stage {i}')


def test_swin_fpn_parity():
    """Backbone+FPN feature parity incl. extra maxpool level
    (reference fpn.py:170-199)."""
    refbridge.install()
    import copy
    from mmdet.models import build_backbone as rbb, build_neck as rbn
    from mmcv.utils import ConfigDict

    bcfg = tiny_swin_backbone_cfg()
    ncfg = dict(type='FPN', in_channels=[24, 48, 96, 192],
                out_channels=32, num_outs=5)
    torch.manual_seed(0)
    ref_b = rbb(ConfigDict(copy.deepcopy(bcfg)))
    ref_b.init_weights()
    ref_n = rbn(ConfigDict(copy.deepcopy(ncfg)))
    ref_n.init_weights()
    ref_b.eval(), ref_n.eval()

    import torch.nn as tnn

    class Pair(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = ref_b
            self.neck = ref_n

    pair = Pair()

    from swindet_tpu.models import build_backbone, build_neck
    from swindet_tpu.utils import jit_init
    import flax.linen as nn

    class JPair(nn.Module):
        def setup(self):
            self._backbone = build_backbone(copy.deepcopy(bcfg))
            self._neck = build_neck(copy.deepcopy(ncfg))

        def __call__(self, img):
            return self._neck(self._backbone(img))

    module = JPair()
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jit_init(module, {'params': jax.random.PRNGKey(0)}, dummy)
    variables = transfer_weights(pair, variables)

    img = make_image(64, 96, seed=11)
    with torch.no_grad():
        ref_outs = ref_n(ref_b(torch.from_numpy(
            np.ascontiguousarray(img.transpose(2, 0, 1))[None])))
    jax_outs = module.apply(variables, jnp.asarray(img)[None])
    assert len(ref_outs) == len(jax_outs) == 5
    for i, (r, j) in enumerate(zip(ref_outs, jax_outs)):
        r = r.numpy()[0].transpose(1, 2, 0)
        np.testing.assert_allclose(np.asarray(j[0]), r, atol=1e-3,
                                   rtol=1e-3, err_msg=f'level {i}')
