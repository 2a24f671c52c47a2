"""Sparse R-CNN DIIHead forward parity vs the reference torch head
(roi_heads/bbox_heads/dii_head.py:16): identical weights + RoI/proposal
features → identical cls scores, deltas, and the next-stage object
feature. Pins self-attention, DynamicConv parameter split, FFN and the
LN placements."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_golden import refbridge
from tests.test_golden.test_detr_transformer_parity import (_bias, _lin,
                                                            _ln)

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')

C, FEAT, S = 16, 8, 7
B, P, K = 2, 6, 4


def _mha(ref_mha, d):
    w = ref_mha.in_proj_weight.detach().numpy()
    b = ref_mha.in_proj_bias.detach().numpy()
    return {
        'q_proj': dict(kernel=jnp.asarray(w[:d].T),
                       bias=jnp.asarray(b[:d])),
        'k_proj': dict(kernel=jnp.asarray(w[d:2 * d].T),
                       bias=jnp.asarray(b[d:2 * d])),
        'v_proj': dict(kernel=jnp.asarray(w[2 * d:].T),
                       bias=jnp.asarray(b[2 * d:])),
        'out_proj': dict(kernel=_lin(ref_mha.out_proj.weight),
                         bias=_bias(ref_mha.out_proj.bias)),
    }


def test_dii_head_forward_parity():
    import torch
    refbridge.install()
    from mmcv.utils import ConfigDict
    from mmdet.models.roi_heads.bbox_heads.dii_head import DIIHead as Ref
    from swindet_tpu.models.roi_heads.sparse_roi_head import DIIHead

    dynamic_conv_cfg = dict(type='DynamicConv', in_channels=C,
                            feat_channels=FEAT, out_channels=C,
                            input_feat_shape=S,
                            act_cfg=dict(type='ReLU', inplace=True),
                            norm_cfg=dict(type='LN'))
    loss_cls = dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                    alpha=0.25, loss_weight=2.0)
    torch.manual_seed(0)
    ref = Ref(num_classes=K, num_ffn_fcs=2, num_heads=2, num_cls_fcs=1,
              num_reg_fcs=1, feedforward_channels=32, in_channels=C,
              dropout=0.0, dynamic_conv_cfg=ConfigDict(dynamic_conv_cfg),
              loss_cls=ConfigDict(loss_cls))
    ref.eval()

    ours = DIIHead(num_classes=K, num_ffn_fcs=2, num_heads=2,
                   num_cls_fcs=1, num_reg_fcs=1,
                   feedforward_channels=32, in_channels=C, dropout=0.0,
                   dynamic_conv_cfg=dynamic_conv_cfg,
                   loss_cls=loss_cls)

    rs = np.random.RandomState(1)
    roi = rs.randn(B * P, C, S, S).astype(np.float32)
    prop = rs.randn(B, P, C).astype(np.float32)
    with torch.no_grad():
        r_cls, r_delta, r_obj = ref(torch.tensor(roi),
                                    torch.tensor(prop))

    roi_nhwc = jnp.asarray(roi.transpose(0, 2, 3, 1))
    variables = ours.init(jax.random.PRNGKey(0), roi_nhwc,
                          jnp.asarray(prop))

    p = {k: dict(v) for k, v in variables['params'].items()}
    p['attention'] = _mha(ref.attention.attn, C)
    p['attention_norm'] = _ln(ref.attention_norm)
    ric = ref.instance_interactive_conv
    p['instance_interactive_conv'] = {
        'dynamic_layer': dict(kernel=_lin(ric.dynamic_layer.weight),
                              bias=_bias(ric.dynamic_layer.bias)),
        'norm_in': _ln(ric.norm_in),
        'norm_out': _ln(ric.norm_out),
        'fc_layer': dict(kernel=_lin(ric.fc_layer.weight),
                         bias=_bias(ric.fc_layer.bias)),
        'fc_norm': _ln(ric.fc_norm),
    }
    p['iic_norm'] = _ln(ref.instance_interactive_conv_norm)
    p['ffn'] = {'fc0': dict(kernel=_lin(ref.ffn.layers[0][0].weight),
                            bias=_bias(ref.ffn.layers[0][0].bias)),
                'fc1': dict(kernel=_lin(ref.ffn.layers[1].weight),
                            bias=_bias(ref.ffn.layers[1].bias))}
    p['ffn_norm'] = _ln(ref.ffn_norm)
    # cls/reg towers: ModuleList of [Linear, LN, ReLU] triplets
    p['cls_fc0'] = dict(kernel=_lin(ref.cls_fcs[0].weight))
    p['cls_ln0'] = _ln(ref.cls_fcs[1])
    p['reg_fc0'] = dict(kernel=_lin(ref.reg_fcs[0].weight))
    p['reg_ln0'] = _ln(ref.reg_fcs[1])
    p['fc_cls'] = dict(kernel=_lin(ref.fc_cls.weight),
                       bias=_bias(ref.fc_cls.bias))
    p['fc_reg'] = dict(kernel=_lin(ref.fc_reg.weight),
                       bias=_bias(ref.fc_reg.bias))

    o_cls, o_delta, o_obj = ours.apply({'params': p}, roi_nhwc,
                                       jnp.asarray(prop))
    np.testing.assert_allclose(np.asarray(o_cls),
                               r_cls.view(B, P, -1).numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_delta),
                               r_delta.view(B, P, 4).numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_obj),
                               r_obj.view(B, P, C).numpy(),
                               rtol=1e-4, atol=1e-4)
