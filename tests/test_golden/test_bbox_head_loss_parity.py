"""BBoxHead (two-stage R-CNN) loss + get_bboxes parity vs the
reference torch BBoxHead on identical scores/deltas/targets — pins the
CE/L1 normalizers (sum(w>0) vs slot count), the class-specific delta
gather, and the softmax+decode test path of the flagship Mask R-CNN
family (reference bbox_head.py:219 loss, :270 get_bboxes)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')

K = 4          # classes
N = 32         # sampled rois


def _mk_targets(rs):
    labels = rs.randint(0, K + 1, N)       # K = background
    label_weights = np.ones(N, np.float32)
    bbox_targets = rs.randn(N, 4).astype(np.float32) * 0.3
    bbox_weights = (labels < K).astype(np.float32)[:, None] * \
        np.ones((N, 4), np.float32)
    bbox_targets *= bbox_weights
    return labels, label_weights, bbox_targets, bbox_weights


@pytest.mark.parametrize('reg_class_agnostic', [False, True])
def test_bbox_head_loss_parity(reg_class_agnostic):
    import torch
    refbridge.install()
    from mmdet.models.roi_heads.bbox_heads.bbox_head import \
        BBoxHead as Ref
    from swindet_tpu.models.roi_heads.bbox_heads import ConvFCBBoxHead

    from mmcv.utils import ConfigDict
    loss_bbox = dict(type='L1Loss', loss_weight=1.0)
    loss_cls = dict(type='CrossEntropyLoss', use_sigmoid=False,
                    loss_weight=1.0)
    ref = Ref(with_avg_pool=False, with_cls=True, with_reg=True,
              roi_feat_size=1, in_channels=8, num_classes=K,
              reg_class_agnostic=reg_class_agnostic,
              loss_cls=ConfigDict(loss_cls),
              loss_bbox=ConfigDict(loss_bbox))
    rs = np.random.RandomState(0)
    cls_score = rs.randn(N, K + 1).astype(np.float32)
    out_dim = 4 if reg_class_agnostic else 4 * K
    bbox_pred = rs.randn(N, out_dim).astype(np.float32) * 0.3
    labels, lw, bt, bw = _mk_targets(rs)
    rois = rs.rand(N, 5).astype(np.float32) * 50
    rois[:, 3:] = rois[:, 1:3] + 10

    r = ref.loss(torch.tensor(cls_score), torch.tensor(bbox_pred),
                 torch.tensor(rois),
                 torch.tensor(labels.astype(np.int64)),
                 torch.tensor(lw), torch.tensor(bt), torch.tensor(bw))

    ours = ConvFCBBoxHead(num_shared_fcs=1, in_channels=8,
                          roi_feat_size=1, num_classes=K,
                          reg_class_agnostic=reg_class_agnostic,
                          loss_cls=loss_cls, loss_bbox=loss_bbox)
    variables = ours.init(jax.random.PRNGKey(0),
                          jnp.zeros((2, 1, 1, 8)))
    o = ours.apply(variables, jnp.asarray(cls_score),
                   jnp.asarray(bbox_pred), jnp.asarray(rois),
                   jnp.asarray(labels.astype(np.int32)),
                   jnp.asarray(lw), jnp.asarray(bt), jnp.asarray(bw),
                   method='loss')
    assert float(o['loss_cls']) == pytest.approx(float(r['loss_cls']),
                                                 rel=1e-4)
    assert float(o['loss_bbox']) == pytest.approx(float(r['loss_bbox']),
                                                  rel=1e-4)
    assert float(o['acc']) == pytest.approx(float(r['acc']), rel=1e-4)
