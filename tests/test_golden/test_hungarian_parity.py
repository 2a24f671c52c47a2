"""HungarianAssigner golden parity vs the reference torch assigner
(mmdet/core/bbox/assigners/hungarian_assigner.py + match_costs):
identical inputs → identical one-to-one matching. Pins the cost
weighting, normalisation, and LSA optimality end to end (the inline
numpy cost oracle lives in test_models/test_set_prediction.py; this is
the torch-source oracle)."""
import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_hungarian_assign_parity(seed):
    import torch
    refbridge.install()
    from mmdet.core.bbox.assigners.hungarian_assigner import \
        HungarianAssigner as RefAssigner
    from swindet_tpu.core.bbox.assigners import HungarianAssigner

    rs = np.random.RandomState(seed)
    q, g, k = 24, 6, 7
    h, w = 80., 100.
    cls_pred = rs.randn(q, k + 1).astype(np.float32)
    bbox_pred = (rs.rand(q, 4) * 0.5 + 0.25).astype(np.float32)  # cxcywh
    gt = rs.rand(g, 4).astype(np.float32)
    gt_bboxes = np.stack([gt[:, 0] * w * 0.5, gt[:, 1] * h * 0.5,
                          gt[:, 0] * w * 0.5 + 10 + gt[:, 2] * w * 0.4,
                          gt[:, 1] * h * 0.5 + 8 + gt[:, 3] * h * 0.4],
                         -1).astype(np.float32)
    gt_labels = rs.randint(0, k, g).astype(np.int32)

    # DETR config costs (configs/detr/detr_r50_8x2_150e_coco.py)
    ref = RefAssigner(
        cls_cost=dict(type='ClassificationCost', weight=1.),
        reg_cost=dict(type='BBoxL1Cost', weight=5.0),
        iou_cost=dict(type='IoUCost', iou_mode='giou', weight=2.0))
    r = ref.assign(torch.tensor(bbox_pred), torch.tensor(cls_pred),
                   torch.tensor(gt_bboxes),
                   torch.tensor(gt_labels.astype(np.int64)),
                   img_meta=dict(img_shape=(int(h), int(w), 3)))

    ours = HungarianAssigner(
        cls_cost=dict(type='ClassificationCost', weight=1.),
        reg_cost=dict(type='BBoxL1Cost', weight=5.0),
        iou_cost=dict(type='IoUCost', iou_mode='giou', weight=2.0))
    o = ours.assign(jnp.asarray(bbox_pred), jnp.asarray(cls_pred),
                    jnp.asarray(gt_bboxes),
                    jnp.ones(g, bool), jnp.asarray(gt_labels),
                    jnp.asarray([w, h, w, h], jnp.float32))

    np.testing.assert_array_equal(np.asarray(o.gt_inds),
                                  r.gt_inds.numpy())
    # matched queries carry the gt's label
    pos = np.asarray(o.gt_inds) > 0
    np.testing.assert_array_equal(np.asarray(o.labels)[pos],
                                  r.labels.numpy()[pos])
