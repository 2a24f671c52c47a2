"""DETR Transformer golden parity vs the reference torch Transformer
(mmdet/models/utils/transformer.py:601): identical weights + inputs →
identical decoder intermediates and encoder memory. Pins the post-norm
order, q/k positional additions, key-padding mask handling, and the
shared final decoder LayerNorm. Also pins SinePositionalEncoding."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')

D, NH, FF = 8, 2, 16
ENC, DEC = 2, 2
Q = 5
B, H, W = 2, 3, 4


def _lin(t):
    return jnp.asarray(t.detach().numpy().T)


def _bias(t):
    return jnp.asarray(t.detach().numpy())


def _mha_params(ref_mha):
    """torch nn.MultiheadAttention → our q/k/v/out projections."""
    w = ref_mha.in_proj_weight.detach().numpy()   # (3D, D)
    b = ref_mha.in_proj_bias.detach().numpy()
    return {
        'q_proj': dict(kernel=jnp.asarray(w[:D].T),
                       bias=jnp.asarray(b[:D])),
        'k_proj': dict(kernel=jnp.asarray(w[D:2 * D].T),
                       bias=jnp.asarray(b[D:2 * D])),
        'v_proj': dict(kernel=jnp.asarray(w[2 * D:].T),
                       bias=jnp.asarray(b[2 * D:])),
        'out_proj': dict(kernel=_lin(ref_mha.out_proj.weight),
                         bias=_bias(ref_mha.out_proj.bias)),
    }


def _ffn_params(ref_ffn):
    return {'fc0': dict(kernel=_lin(ref_ffn.layers[0][0].weight),
                        bias=_bias(ref_ffn.layers[0][0].bias)),
            'fc1': dict(kernel=_lin(ref_ffn.layers[1].weight),
                        bias=_bias(ref_ffn.layers[1].bias))}


def _ln(ref_ln):
    return dict(scale=_bias(ref_ln.weight), bias=_bias(ref_ln.bias))


def test_detr_transformer_parity():
    import torch
    refbridge.install()
    from mmdet.models.utils.transformer import Transformer as RefT
    from swindet_tpu.models.transformer import DetrTransformer

    torch.manual_seed(0)
    ref = RefT(embed_dims=D, num_heads=NH, num_encoder_layers=ENC,
               num_decoder_layers=DEC, feedforward_channels=FF,
               dropout=0.0, return_intermediate_dec=True)
    ref.eval()

    params = {}
    for i, layer in enumerate(ref.encoder.layers):
        params[f'enc{i}'] = {
            'self_attn': _mha_params(layer.self_attn.attn),
            'ffn': _ffn_params(layer.ffn),
            'norm1': _ln(layer.norms[0]),
            'norm2': _ln(layer.norms[1]),
        }
    for i, layer in enumerate(ref.decoder.layers):
        params[f'dec{i}'] = {
            'self_attn': _mha_params(layer.self_attn.attn),
            'cross_attn': _mha_params(layer.multihead_attn.attn),
            'ffn': _ffn_params(layer.ffn),
            'norm1': _ln(layer.norms[0]),
            'norm2': _ln(layer.norms[1]),
            'norm3': _ln(layer.norms[2]),
        }
    params['dec_norm'] = _ln(ref.decoder.norm)

    rs = np.random.RandomState(0)
    x = rs.randn(B, D, H, W).astype(np.float32)
    # last column of image 0 padded
    mask = np.zeros((B, H, W), bool)
    mask[0, :, -1] = True
    query_embed = rs.randn(Q, D).astype(np.float32)
    pos = rs.randn(B, D, H, W).astype(np.float32)

    with torch.no_grad():
        out_ref, mem_ref = ref(torch.tensor(x), torch.tensor(mask),
                               torch.tensor(query_embed),
                               torch.tensor(pos))

    ours = DetrTransformer(embed_dims=D, num_heads=NH,
                           num_encoder_layers=ENC, num_decoder_layers=DEC,
                           feedforward_channels=FF, dropout=0.0,
                           return_intermediate_dec=True)
    x_seq = jnp.asarray(x.reshape(B, D, H * W).transpose(0, 2, 1))
    pos_seq = jnp.asarray(pos.reshape(B, D, H * W).transpose(0, 2, 1))
    mask_seq = jnp.asarray(mask.reshape(B, H * W))
    out_o, mem_o = ours.apply({'params': params}, x_seq, mask_seq,
                              jnp.asarray(query_embed), pos_seq)

    np.testing.assert_allclose(np.asarray(out_o), out_ref.numpy(),
                               rtol=1e-4, atol=1e-4)
    mem_ref_seq = mem_ref.numpy().reshape(B, D, H * W).transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(mem_o), mem_ref_seq,
                               rtol=1e-4, atol=1e-4)


def test_sine_positional_encoding_parity():
    import torch
    refbridge.install()
    from mmdet.models.utils.positional_encoding import \
        SinePositionalEncoding as RefPE
    from swindet_tpu.models.transformer import sine_positional_encoding

    mask = np.zeros((2, 5, 7), bool)
    mask[0, 3:, :] = True
    mask[1, :, 5:] = True
    ref = RefPE(num_feats=4, normalize=True)
    with torch.no_grad():
        r = ref(torch.tensor(mask))               # (B, 2*nf, H, W)
    o = sine_positional_encoding(jnp.asarray(~mask), 4, normalize=True)
    np.testing.assert_allclose(np.asarray(o),
                               r.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-5)
