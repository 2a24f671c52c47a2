"""SABLHead forward parity vs the reference torch head
(roi_heads/bbox_heads/sabl_head.py): identical weights + RoI features
→ identical cls scores, bucket logits, bucket offsets, decoded boxes.
Pins the attention-pool normalisation axes, 1-D post-conv orientation,
ConvTranspose upsample layout, and side_aware_split ordering."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')

C = 16  # channels (keep the torch CPU run cheap)


def _head_kwargs():
    return dict(
        num_classes=4, cls_in_channels=C, reg_in_channels=C,
        roi_feat_size=7, reg_feat_up_ratio=2, reg_pre_kernel=3,
        reg_post_kernel=3, reg_pre_num=2, reg_post_num=1,
        cls_out_channels=32, reg_offset_out_channels=16,
        reg_cls_out_channels=16, num_cls_fcs=1, num_reg_fcs=0,
        reg_class_agnostic=True, norm_cfg=None,
        bbox_coder=dict(type='BucketingBBoxCoder', num_buckets=14,
                        scale_factor=1.7),
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                      loss_weight=1.0),
        loss_bbox_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                           loss_weight=1.0),
        loss_bbox_reg=dict(type='SmoothL1Loss', beta=0.1,
                           loss_weight=1.0))


def _lin(t):     # torch Linear (out, in) → flax kernel (in, out)
    return jnp.asarray(t.detach().numpy().T)


def _conv2d(t):  # torch (O, I, kh, kw) → flax (kh, kw, I, O)
    return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))


def _conv1d_from2d(t, axis):
    """torch (O, I, 1, k) or (O, I, k, 1) → flax 1-D (k, I, O)."""
    w = t.detach().numpy()
    w = w.squeeze(axis)                        # (O, I, k)
    return jnp.asarray(w.transpose(2, 1, 0))


def _deconv1d(t):
    """torch ConvTranspose1d (in, out, k) → flax ConvTranspose
    (k, in, out) with the spatial axis flipped (same rule as
    checkpoint.py's ConvTranspose2d handling)."""
    return jnp.asarray(t.detach().numpy().transpose(2, 0, 1)[::-1])


def _transfer(ref, params):
    p = jax.tree.map(lambda x: x, params)  # shallow copy via rebuild
    p = {k: dict(v) if isinstance(v, dict) else v for k, v in p.items()}
    # first cls FC consumes the flattened spatial map: torch flattens
    # (C, H, W), ours (H, W, C) — reorder input columns (same rule as
    # checkpoint.py flatten_hints)
    w = ref.cls_fcs[0].weight.detach().numpy()
    w = w.reshape(-1, C, 7, 7).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
    p['cls_fcs0'] = dict(kernel=jnp.asarray(w.T),
                         bias=jnp.asarray(ref.cls_fcs[0].bias.detach()
                                          .numpy()))
    p['fc_cls'] = dict(kernel=_lin(ref.fc_cls.weight),
                       bias=jnp.asarray(ref.fc_cls.bias.detach().numpy()))
    for i in range(2):
        conv = ref.reg_pre_convs[i].conv
        p[f'reg_pre_convs{i}'] = dict(conv=dict(
            kernel=_conv2d(conv.weight),
            bias=jnp.asarray(conv.bias.detach().numpy())))
    p['reg_post_conv_xs0'] = dict(
        kernel=_conv1d_from2d(ref.reg_post_conv_xs[0].conv.weight, 2),
        bias=jnp.asarray(ref.reg_post_conv_xs[0].conv.bias.detach()
                         .numpy()))
    p['reg_post_conv_ys0'] = dict(
        kernel=_conv1d_from2d(ref.reg_post_conv_ys[0].conv.weight, 3),
        bias=jnp.asarray(ref.reg_post_conv_ys[0].conv.bias.detach()
                         .numpy()))
    p['reg_conv_att_x'] = dict(
        kernel=jnp.asarray(ref.reg_conv_att_x.weight.detach().numpy()
                           .transpose(2, 3, 1, 0)),
        bias=jnp.asarray(ref.reg_conv_att_x.bias.detach().numpy()))
    p['reg_conv_att_y'] = dict(
        kernel=jnp.asarray(ref.reg_conv_att_y.weight.detach().numpy()
                           .transpose(2, 3, 1, 0)),
        bias=jnp.asarray(ref.reg_conv_att_y.bias.detach().numpy()))
    p['upsample_x'] = dict(kernel=_deconv1d(ref.upsample_x.weight),
                           bias=jnp.asarray(ref.upsample_x.bias.detach()
                                            .numpy()))
    p['upsample_y'] = dict(kernel=_deconv1d(ref.upsample_y.weight),
                           bias=jnp.asarray(ref.upsample_y.bias.detach()
                                            .numpy()))
    p['fc_reg_cls'] = dict(kernel=_lin(ref.fc_reg_cls.weight),
                           bias=jnp.asarray(ref.fc_reg_cls.bias.detach()
                                            .numpy()))
    p['fc_reg_offset'] = dict(
        kernel=_lin(ref.fc_reg_offset.weight),
        bias=jnp.asarray(ref.fc_reg_offset.bias.detach().numpy()))
    return p


def test_sabl_head_forward_parity():
    import torch
    refbridge.install()
    from mmdet.models.roi_heads.bbox_heads.sabl_head import \
        SABLHead as RefHead
    from swindet_tpu.models.roi_heads.sabl_head import SABLHead

    torch.manual_seed(0)
    ref = RefHead(**_head_kwargs())
    ref.init_weights()
    ref.eval()

    ours = SABLHead(**_head_kwargs())
    rs = np.random.RandomState(1)
    feats = rs.randn(5, C, 7, 7).astype(np.float32)
    feats_nhwc = jnp.asarray(feats.transpose(0, 2, 3, 1))
    variables = ours.init(jax.random.PRNGKey(0), feats_nhwc)
    params = _transfer(ref, variables['params'])

    cls_o, (bcls_o, boff_o) = ours.apply({'params': params}, feats_nhwc)
    with torch.no_grad():
        cls_r, (bcls_r, boff_r) = ref(torch.tensor(feats))

    np.testing.assert_allclose(np.asarray(cls_o), cls_r.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bcls_o), bcls_r.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(boff_o), boff_r.numpy(),
                               rtol=1e-4, atol=1e-4)

    # decoded boxes through each side's coder
    rois = rs.rand(5, 4).astype(np.float32) * 60
    rois[:, 2:] += rois[:, :2] + 15
    with torch.no_grad():
        rb, rc = ref.bbox_coder.decode(
            torch.tensor(rois), [bcls_r, boff_r], max_shape=(100, 100))
    from swindet_tpu.core.bbox.coders import BucketingBBoxCoder
    coder = BucketingBBoxCoder(num_buckets=14, scale_factor=1.7)
    ob, oc = coder.decode(
        jnp.asarray(rois), (bcls_o, boff_o), max_shape=(100, 100))
    np.testing.assert_allclose(np.asarray(ob), rb.numpy(), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(oc), rc.numpy(), rtol=1e-3,
                               atol=1e-3)
