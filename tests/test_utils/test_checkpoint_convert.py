"""Weight-converter parity vs real torch layer semantics.

No released .pth can be fetched in this environment (zero egress), so
parity is proven layer-by-layer: identical weights through torch ops vs
the converted flax params through flax ops must agree numerically
(the composition then covers full checkpoints; reference loader
semantics: mmcv_custom/checkpoint.py:286-352)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import flax.linen as nn  # noqa: E402

from swindet_tpu.checkpoint import (convert_torch_state_dict,
                                    flax_path_to_torch_key,
                                    _interp_bias_table)


def _convert(sd, params, hints=None):
    sd = {k: v.detach() for k, v in sd.items()}
    new, report = convert_torch_state_dict(sd, params,
                                           flatten_hints=hints)
    return new, report


def test_conv2d_parity(rng):
    tconv = torch.nn.Conv2d(3, 8, 3, padding=1)
    x = rng.randn(2, 5, 6, 3).astype(np.float32)

    fconv = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)])
    params = fconv.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']

    sd = {'conv.weight': tconv.weight, 'conv.bias': tconv.bias}
    wrapped = {'conv': params}
    new, report = _convert(sd, wrapped)
    assert not report['missing'], report

    out_f = fconv.apply({'params': new['conv']}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tconv(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(out_f),
                               out_t.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-5, atol=1e-5)


def test_linear_parity(rng):
    tfc = torch.nn.Linear(12, 7)
    x = rng.randn(4, 12).astype(np.float32)
    ffc = nn.Dense(7)
    params = ffc.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
    sd = {'fc.weight': tfc.weight, 'fc.bias': tfc.bias}
    new, report = _convert(sd, {'fc': params})
    assert not report['missing']
    out_f = ffc.apply({'params': new['fc']}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tfc(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out_f), out_t.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_deconv2x_parity(rng):
    """mask head upsample: torch ConvTranspose2d(k=2, s=2) vs flax
    ConvTranspose — the converter's layout change must line up."""
    tdc = torch.nn.ConvTranspose2d(4, 6, 2, stride=2)
    x = rng.randn(2, 7, 7, 4).astype(np.float32)
    fdc = nn.ConvTranspose(6, (2, 2), strides=(2, 2))
    params = fdc.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
    sd = {'up.weight': tdc.weight, 'up.bias': tdc.bias}
    new, report = _convert(sd, {'up': params})
    assert not report['missing']
    out_f = fdc.apply({'params': new['up']}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tdc(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(out_f),
                               out_t.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)


def test_layernorm_parity(rng):
    tln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        tln.weight.mul_(1.7)
        tln.bias.add_(0.3)
    x = rng.randn(3, 16).astype(np.float32)
    fln = nn.LayerNorm(epsilon=1e-5)
    params = fln.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
    sd = {'norm.weight': tln.weight, 'norm.bias': tln.bias}
    new, report = _convert(sd, {'norm': params})
    assert not report['missing']
    out_f = fln.apply({'params': new['norm']}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tln(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out_f), out_t.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_first_fc_chw_to_hwc_reorder(rng):
    """torch: flatten NCHW (C fastest-varying last? no — C-major) then
    Linear; flax: flatten NHWC. The flatten hint must reorder the FC
    input dim so outputs agree."""
    c, h, w, out = 4, 3, 3, 5
    tfc = torch.nn.Linear(c * h * w, out)
    feat = rng.randn(2, h, w, c).astype(np.float32)

    ffc = nn.Dense(out)
    params = ffc.init(jax.random.PRNGKey(0),
                      jnp.asarray(feat.reshape(2, -1)))['params']
    sd = {'shared_fcs.0.weight': tfc.weight,
          'shared_fcs.0.bias': tfc.bias}
    new, report = _convert(sd, {'shared_fcs0': params},
                           hints={'shared_fcs0': (h, w, c)})
    assert not report['missing']
    out_f = ffc.apply({'params': new['shared_fcs0']},
                      jnp.asarray(feat.reshape(2, -1)))
    with torch.no_grad():
        out_t = tfc(torch.from_numpy(feat).permute(0, 3, 1, 2)
                    .reshape(2, -1))
    np.testing.assert_allclose(np.asarray(out_f), out_t.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_key_mapping_swin_names():
    assert flax_path_to_torch_key(
        ('_backbone', 'layers0', 'blocks1', 'attn', 'qkv', 'kernel')) == \
        'backbone.layers.0.blocks.1.attn.qkv.weight'
    assert flax_path_to_torch_key(
        ('_backbone', 'layers2', 'downsample', 'reduction', 'kernel')) == \
        'backbone.layers.2.downsample.reduction.weight'
    assert flax_path_to_torch_key(
        ('_backbone', 'norm0', 'scale')) == 'backbone.norm0.weight'
    assert flax_path_to_torch_key(
        ('_neck', 'lateral_convs0', 'conv', 'kernel')) == \
        'neck.lateral_convs.0.conv.weight'
    assert flax_path_to_torch_key(
        ('_roi_head', '_bbox_head', 'shared_fcs0', 'kernel')) == \
        'roi_head.bbox_head.shared_fcs.0.weight'


def test_bias_table_interp_shapes(rng):
    t = rng.randn(13 * 13, 3).astype(np.float32)   # window 7 table
    out = _interp_bias_table(t, 27 * 27, 3)         # window 14
    assert out.shape == (27 * 27, 3)
    # identity when size matches after round-trip
    same = _interp_bias_table(t, 13 * 13, 3)
    np.testing.assert_allclose(same, t, rtol=1e-5, atol=1e-5)


def test_moby_and_module_prefix_stripping(rng):
    tfc = torch.nn.Linear(4, 4)
    ffc = nn.Dense(4)
    params = ffc.init(jax.random.PRNGKey(0), jnp.ones((1, 4)))['params']
    for prefix in ('module.', 'encoder.'):
        sd = {f'{prefix}fc.weight': tfc.weight,
              f'{prefix}fc.bias': tfc.bias}
        new, report = _convert(sd, {'fc': params})
        assert not report['missing'], prefix


def test_swin_qkv_packed_roundtrip(rng):
    """A torch-side W-MSA qkv projection must match the flax Dense after
    conversion (packed 3C output layout is preserved 1:1)."""
    c = 24
    tqkv = torch.nn.Linear(c, 3 * c)
    x = rng.randn(5, 49, c).astype(np.float32)
    fqkv = nn.Dense(3 * c)
    params = fqkv.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
    sd = {'attn.qkv.weight': tqkv.weight, 'attn.qkv.bias': tqkv.bias}
    new, report = _convert(sd, {'attn': {'qkv': params}})
    assert not report['missing']
    out_f = fqkv.apply({'params': new['attn']['qkv']}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tqkv(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out_f), out_t.numpy(),
                               rtol=1e-5, atol=2e-5)
