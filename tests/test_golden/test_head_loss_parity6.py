"""Training-loss parity, wave 6: DETR TransformerHead — Hungarian
matching is deterministic, so the per-decoder-layer CE/L1/GIoU losses
must match the reference torch head on identical predictions + gts
(incl. the 0.1 background class weight and the num_total_pos
normalizers)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')

H, W = 60, 80
B, G, Q, C = 2, 4, 10, 4
L = 3  # decoder layers


def test_detr_loss_parity():
    import torch
    refbridge.install()
    from mmcv.utils import ConfigDict
    from mmdet.models.dense_heads.transformer_head import \
        TransformerHead as Ref
    from swindet_tpu.models.builder import build_head

    loss_cls = dict(type='CrossEntropyLoss', bg_cls_weight=0.1,
                    use_sigmoid=False, loss_weight=1.0,
                    class_weight=1.0)
    loss_bbox = dict(type='L1Loss', loss_weight=5.0)
    loss_iou = dict(type='GIoULoss', loss_weight=2.0)
    assigner = dict(
        type='HungarianAssigner',
        cls_cost=dict(type='ClassificationCost', weight=1.),
        reg_cost=dict(type='BBoxL1Cost', weight=5.0),
        iou_cost=dict(type='IoUCost', iou_mode='giou', weight=2.0))

    ref = Ref(num_classes=C, in_channels=8,
              num_fcs=2,
              transformer=dict(type='Transformer', embed_dims=8,
                               num_heads=2, num_encoder_layers=1,
                               num_decoder_layers=L,
                               feedforward_channels=16, dropout=0.0,
                               return_intermediate_dec=True),
              positional_encoding=dict(type='SinePositionalEncoding',
                                       num_feats=4, normalize=True),
              loss_cls=ConfigDict(loss_cls),
              loss_bbox=ConfigDict(loss_bbox),
              loss_iou=ConfigDict(loss_iou),
              train_cfg=ConfigDict(dict(assigner=assigner)),
              test_cfg=ConfigDict(dict(max_per_img=Q)))

    rs = np.random.RandomState(0)
    all_cls = rs.randn(L, B, Q, C + 1).astype(np.float32)
    all_bbox = (rs.rand(L, B, Q, 4) * 0.6 + 0.2).astype(np.float32)
    gt = np.zeros((B, G, 4), np.float32)
    gt[..., 0] = rs.rand(B, G) * (W - 30)
    gt[..., 1] = rs.rand(B, G) * (H - 30)
    gt[..., 2] = gt[..., 0] + 6 + rs.rand(B, G) * 20
    gt[..., 3] = gt[..., 1] + 6 + rs.rand(B, G) * 20
    labels = rs.randint(0, C, (B, G))
    metas = [dict(img_shape=(H, W, 3), pad_shape=(H, W, 3))
             for _ in range(B)]
    r = ref.loss([torch.tensor(all_cls)], [torch.tensor(all_bbox)],
                 [torch.tensor(gt[i]) for i in range(B)],
                 [torch.tensor(labels[i].astype(np.int64))
                  for i in range(B)], metas)

    ours = build_head(dict(
        type='TransformerHead', num_classes=C, in_channels=8,
        transformer=dict(embed_dims=8, num_heads=2,
                         num_encoder_layers=1, num_decoder_layers=L,
                         feedforward_channels=16, dropout=0.0,
                         return_intermediate_dec=True),
        positional_encoding=dict(type='SinePositionalEncoding',
                                 num_feats=4, normalize=True),
        loss_cls=loss_cls, loss_bbox=loss_bbox, loss_iou=loss_iou,
        train_cfg=dict(assigner=assigner),
        test_cfg=dict(max_per_img=Q)))
    variables = ours.init(jax.random.PRNGKey(0),
                          [jnp.zeros((1, 8, 8, 8))],
                          jnp.asarray([[64, 64]], jnp.int32))
    o = ours.apply(
        variables, jax.random.PRNGKey(1),
        jnp.asarray(all_cls), jnp.asarray(all_bbox),
        jnp.asarray(gt), jnp.ones((B, G), bool),
        jnp.asarray(labels.astype(np.int32)),
        jnp.asarray([[H, W]] * B, jnp.int32),
        jnp.asarray([[H, W]] * B, jnp.int32),
        method='loss')

    assert float(o['loss_cls']) == pytest.approx(
        float(r['loss_cls']), rel=1e-3)
    assert float(o['loss_bbox']) == pytest.approx(
        float(r['loss_bbox']), rel=1e-3)
    assert float(o['loss_iou']) == pytest.approx(
        float(r['loss_iou']), rel=1e-3)
    for li in range(L - 1):
        assert float(o[f'd{li}.loss_cls']) == pytest.approx(
            float(r[f'd{li}.loss_cls']), rel=1e-3)
        assert float(o[f'd{li}.loss_iou']) == pytest.approx(
            float(r[f'd{li}.loss_iou']), rel=1e-3)
