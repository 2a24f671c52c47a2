"""Set-prediction family tests: in-jit LSA vs the scipy oracle, the
HungarianAssigner vs a numpy re-derivation of the reference cost
formulas (mmdet/core/bbox/assigners/hungarian_assigner.py:52 +
match_costs/match_cost.py), and tiny-forward tests for DETR and
Sparse R-CNN (reference test model: tests/test_models/test_forward.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment as scipy_lsa

from swindet_tpu.core.bbox.lsa import linear_sum_assignment
from swindet_tpu.core.bbox.assigners import HungarianAssigner
from swindet_tpu.models import build_detector

from tests.test_models.test_forward import demo_inputs


# --------------------------------------------------------------- LSA core
class TestLinearSumAssignment:
    def test_optimal_vs_scipy(self, rng):
        for trial in range(10):
            r = rng.randint(1, 12)
            c = rng.randint(r, 20)
            cost = (rng.randn(r, c) * 10).astype(np.float32)
            ours = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
            ri, ci = scipy_lsa(cost)
            assert len(set(ours.tolist())) == r, 'columns not distinct'
            assert cost[np.arange(r), ours].sum() == pytest.approx(
                cost[ri, ci].sum(), abs=1e-3), f'trial {trial} suboptimal'

    def test_padded_rows_do_not_perturb(self, rng):
        cost = rng.randn(6, 10).astype(np.float32)
        valid = np.array([True] * 4 + [False] * 2)
        ours = np.asarray(linear_sum_assignment(jnp.asarray(cost),
                                                jnp.asarray(valid)))
        ri, ci = scipy_lsa(cost[:4])
        assert cost[np.arange(4), ours[:4]].sum() == pytest.approx(
            cost[ri, ci].sum(), abs=1e-3)

    def test_jit_and_vmap(self, rng):
        cost = jnp.asarray(rng.randn(3, 8, 10).astype(np.float32))
        out = jax.jit(jax.vmap(linear_sum_assignment))(cost)
        assert out.shape == (3, 8)
        for b in range(3):
            ri, ci = scipy_lsa(np.asarray(cost[b]))
            got = np.asarray(cost[b])[np.arange(8), np.asarray(out[b])]
            assert got.sum() == pytest.approx(
                np.asarray(cost[b])[ri, ci].sum(), abs=1e-3)


# ------------------------------------------------- Hungarian cost parity
def _ref_costs_numpy(cls_pred, bbox_pred, gt_bboxes, gt_labels, whwh,
                     mode='detr'):
    """Reference cost formulas (match_cost.py): ClassificationCost /
    FocalLossCost, BBoxL1Cost, giou IoUCost — numpy oracle."""
    if mode == 'detr':
        sm = np.exp(cls_pred - cls_pred.max(-1, keepdims=True))
        sm = sm / sm.sum(-1, keepdims=True)
        cls_cost = -sm[:, gt_labels] * 1.0
        # L1 on xyxy-normalized (pred cxcywh -> xyxy)
        cx, cy, w, h = [bbox_pred[:, i] for i in range(4)]
        pred_xyxy = np.stack([cx - w / 2, cy - h / 2,
                              cx + w / 2, cy + h / 2], -1)
        norm_gt = gt_bboxes / whwh[None]
        reg_cost = np.abs(pred_xyxy[:, None] - norm_gt[None]).sum(-1) * 5.0
        pred_pix = pred_xyxy * whwh[None]
    else:  # sparse: focal cost, L1 in normalized xywh
        p = 1 / (1 + np.exp(-cls_pred))
        eps = 1e-12
        neg = -np.log(1 - p + eps) * (1 - 0.25) * p ** 2
        pos = -np.log(p + eps) * 0.25 * (1 - p) ** 2
        cls_cost = (pos - neg)[:, gt_labels] * 2.0
        gx1, gy1, gx2, gy2 = [gt_bboxes[:, i] / whwh[i] for i in range(4)]
        gt_ccwh = np.stack([(gx1 + gx2) / 2, (gy1 + gy2) / 2,
                            gx2 - gx1, gy2 - gy1], -1)
        reg_cost = np.abs(bbox_pred[:, None] - gt_ccwh[None]).sum(-1) * 5.0
        cx, cy, w, h = [bbox_pred[:, i] for i in range(4)]
        pred_pix = np.stack([cx - w / 2, cy - h / 2,
                             cx + w / 2, cy + h / 2], -1) * whwh[None]
    # giou cost
    n, g = pred_pix.shape[0], gt_bboxes.shape[0]
    giou = np.zeros((n, g), np.float64)
    for i in range(n):
        for j in range(g):
            b1, b2 = pred_pix[i], gt_bboxes[j]
            iw = max(0, min(b1[2], b2[2]) - max(b1[0], b2[0]))
            ih = max(0, min(b1[3], b2[3]) - max(b1[1], b2[1]))
            inter = iw * ih
            a1 = max(0, b1[2] - b1[0]) * max(0, b1[3] - b1[1])
            a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
            union = a1 + a2 - inter
            ew = max(b1[2], b2[2]) - min(b1[0], b2[0])
            eh = max(b1[3], b2[3]) - min(b1[1], b2[1])
            enc = ew * eh
            iou = inter / max(union, 1e-7)
            giou[i, j] = iou - (enc - union) / max(enc, 1e-7)
    iou_cost = -giou * 2.0
    return cls_cost + reg_cost + iou_cost


class TestHungarianAssigner:
    @pytest.mark.parametrize('mode', ['detr', 'sparse'])
    def test_matches_reference_cost_assignment(self, rng, mode):
        q, g, k = 20, 5, 7
        whwh = np.array([100., 80., 100., 80.], np.float32)
        cls_pred = rng.randn(q, (k + 1) if mode == 'detr' else k) \
            .astype(np.float32)
        bbox_pred = (rng.rand(q, 4) * 0.5 + 0.25).astype(np.float32)
        cx = rng.rand(g) * 60 + 20
        cy = rng.rand(g) * 40 + 20
        bw = rng.rand(g) * 30 + 5
        bh = rng.rand(g) * 20 + 5
        gt = np.stack([cx - bw / 2, cy - bh / 2,
                       cx + bw / 2, cy + bh / 2], -1).astype(np.float32)
        labels = rng.randint(0, k, g).astype(np.int32)
        valid = np.array([True] * g)

        if mode == 'detr':
            assigner = HungarianAssigner(
                cls_cost=dict(type='ClassificationCost', weight=1.),
                reg_cost=dict(type='BBoxL1Cost', weight=5.0),
                iou_cost=dict(type='IoUCost', iou_mode='giou', weight=2.0))
            pred_in = bbox_pred
        else:
            assigner = HungarianAssigner(
                cls_cost=dict(type='FocalLossCost', weight=2.0),
                reg_cost=dict(type='BBoxL1Cost', weight=5.0,
                              box_format='xywh'),
                iou_cost=dict(type='IoUCost', iou_mode='giou', weight=2.0))
            pred_in = bbox_pred  # already normalized cxcywh

        res = assigner.assign(jnp.asarray(pred_in), jnp.asarray(cls_pred),
                              jnp.asarray(gt), jnp.asarray(valid),
                              jnp.asarray(labels), jnp.asarray(whwh))
        cost = _ref_costs_numpy(cls_pred, bbox_pred, gt, labels, whwh,
                                mode)
        gi, qi = scipy_lsa(cost.T)  # rows = gts
        exp_gt_inds = np.zeros((q,), np.int32)
        exp_gt_inds[qi] = gi + 1
        got = np.asarray(res.gt_inds)
        assert (got == exp_gt_inds).all(), (got.nonzero(),
                                            exp_gt_inds.nonzero())
        got_lbl = np.asarray(res.labels)
        assert (got_lbl[qi] == labels[gi]).all()
        assert (got_lbl[got == 0] == -1).all()

    def test_gt_padding_exceeds_queries(self, rng):
        """The loader pads GTs to a fixed max (e.g. 100) which can exceed
        num_proposals; valid gts must still match exactly."""
        q, g = 8, 100
        whwh = np.array([64., 64., 64., 64.], np.float32)
        valid = np.zeros((g,), bool)
        valid[[3, 40, 77]] = True
        assigner = HungarianAssigner()
        res = assigner.assign(
            jnp.asarray((rng.rand(q, 4) * 0.5 + 0.25).astype(np.float32)),
            jnp.asarray(rng.randn(q, 5).astype(np.float32)),
            jnp.asarray((rng.rand(g, 4) * 30 + 5).astype(np.float32)),
            jnp.asarray(valid),
            jnp.asarray(rng.randint(0, 4, g).astype(np.int32)),
            jnp.asarray(whwh))
        gt_inds = np.asarray(res.gt_inds)
        assert (gt_inds > 0).sum() == 3
        assert set(gt_inds[gt_inds > 0].tolist()) == {4, 41, 78}

    def test_invalid_gts_unmatched(self, rng):
        q, g = 12, 4
        whwh = np.array([64., 64., 64., 64.], np.float32)
        assigner = HungarianAssigner()
        valid = np.array([True, True, False, False])
        res = assigner.assign(
            jnp.asarray((rng.rand(q, 4) * 0.5 + 0.25).astype(np.float32)),
            jnp.asarray(rng.randn(q, 5).astype(np.float32)),
            jnp.asarray((rng.rand(g, 4) * 30).astype(np.float32)),
            jnp.asarray(valid),
            jnp.asarray(rng.randint(0, 4, g).astype(np.int32)),
            jnp.asarray(whwh))
        gt_inds = np.asarray(res.gt_inds)
        assert (gt_inds > 0).sum() == 2
        assert set(gt_inds[gt_inds > 0].tolist()) == {1, 2}


# ------------------------------------------------------------ DETR tiny
def tiny_detr_cfg():
    return dict(
        type='DETR',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(3,)),
        bbox_head=dict(
            type='TransformerHead', num_classes=4, in_channels=128,
            num_fcs=2,
            transformer=dict(embed_dims=32, num_heads=2,
                             num_encoder_layers=2, num_decoder_layers=2,
                             feedforward_channels=64, dropout=0.1),
            positional_encoding=dict(num_feats=16, normalize=True),
            loss_cls=dict(type='CrossEntropyLoss', bg_cls_weight=0.1,
                          use_sigmoid=False, loss_weight=1.0),
            loss_bbox=dict(type='L1Loss', loss_weight=5.0),
            loss_iou=dict(type='GIoULoss', loss_weight=2.0)),
        train_cfg=dict(assigner=dict(
            type='HungarianAssigner',
            cls_cost=dict(type='ClassificationCost', weight=1.),
            reg_cost=dict(type='BBoxL1Cost', weight=5.0),
            iou_cost=dict(type='IoUCost', iou_mode='giou', weight=2.0))),
        test_cfg=dict(max_per_img=20))


def tiny_sparse_rcnn_cfg(num_stages=2):
    return dict(
        type='SparseRCNN',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(0, 1, 2, 3)),
        neck=dict(type='FPN', in_channels=[16, 32, 64, 128],
                  out_channels=16, start_level=0,
                  add_extra_convs='on_input', num_outs=4),
        rpn_head=dict(type='EmbeddingRPNHead', num_proposals=16,
                      proposal_feature_channel=16),
        roi_head=dict(
            type='SparseRoIHead', num_stages=num_stages,
            stage_loss_weights=[1] * num_stages,
            proposal_feature_channel=16,
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=7,
                               sampling_ratio=2),
                out_channels=16, featmap_strides=[4, 8, 16, 32]),
            bbox_head=[dict(type='DIIHead', num_classes=4, num_ffn_fcs=2,
                            num_heads=2, num_cls_fcs=1, num_reg_fcs=1,
                            feedforward_channels=32, in_channels=16,
                            dropout=0.0,
                            dynamic_conv_cfg=dict(in_channels=16,
                                                  feat_channels=8,
                                                  out_channels=16,
                                                  input_feat_shape=7))
                       for _ in range(num_stages)]),
        train_cfg=dict(rpn=None, rcnn=[dict(
            assigner=dict(type='HungarianAssigner',
                          cls_cost=dict(type='FocalLossCost', weight=2.0),
                          reg_cost=dict(type='BBoxL1Cost', weight=5.0,
                                        box_format='xywh'),
                          iou_cost=dict(type='IoUCost', iou_mode='giou',
                                        weight=2.0)),
            sampler=dict(type='PseudoSampler'), pos_weight=1)
            for _ in range(num_stages)]),
        test_cfg=dict(rpn=None, rcnn=dict(max_per_img=16)))


@pytest.fixture(scope='module')
def detr_model():
    model = build_detector(tiny_detr_cfg())
    batch = demo_inputs(b=2, h=64, w=64, g=3, with_mask=False)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1),
         'dropout': jax.random.PRNGKey(2)},
        batch['img'], method='forward_dummy')
    return model, variables, batch


@pytest.fixture(scope='module')
def sparse_model():
    model = build_detector(tiny_sparse_rcnn_cfg())
    batch = demo_inputs(b=2, h=64, w=64, g=3, with_mask=False)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'], method='forward_dummy')
    return model, variables, batch


class TestDETRForward:
    def test_forward_train_losses(self, detr_model):
        model, variables, batch = detr_model
        losses = model.apply(
            variables, batch['img'], batch['img_shapes'],
            batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
            batch['gt_labels'], method='forward_train',
            rngs={'sampling': jax.random.PRNGKey(2),
                  'dropout': jax.random.PRNGKey(3)})
        # final + 1 aux decoder layer, 3 losses each
        for k in ('loss_cls', 'loss_bbox', 'loss_iou', 'd0.loss_cls',
                  'd0.loss_bbox', 'd0.loss_iou'):
            assert k in losses and np.isfinite(float(losses[k])), k
        assert float(losses['loss_cls']) > 0

    def test_forward_train_empty_gt(self, detr_model):
        model, variables, batch = detr_model
        losses = model.apply(
            variables, batch['img'], batch['img_shapes'],
            batch['pad_shapes'], batch['gt_bboxes'],
            jnp.zeros_like(batch['gt_valid']), batch['gt_labels'],
            method='forward_train',
            rngs={'sampling': jax.random.PRNGKey(2),
                  'dropout': jax.random.PRNGKey(3)})
        for k, v in losses.items():
            assert np.isfinite(float(v)), k

    def test_simple_test_shapes(self, detr_model):
        model, variables, batch = detr_model
        out = model.apply(variables, batch['img'], batch['img_shapes'],
                          jnp.ones((2, 4), jnp.float32),
                          method='simple_test')
        assert out['dets'].shape == (2, 20, 5)
        assert out['labels'].shape == (2, 20)
        s = np.asarray(out['dets'][..., 4])
        assert ((s >= 0) & (s <= 1)).all()

    def test_padding_mask_invariance(self, detr_model):
        """Pad tokens must not leak into the decoder: running the HEAD on
        a feature map padded with garbage (beyond img_shape) must give
        the same detections — pins the key_padding_mask + masked-cumsum
        positional encoding. (The full-CNN path is NOT pad-invariant:
        bias/BN constants in the pad region propagate inward — identical
        artifact in the torch reference, so the head is the right unit.)
        """
        model, variables, batch = detr_model
        feats = model.apply(variables, batch['img'])
        head_vars = {'params': variables['params']['_bbox_head']}
        from swindet_tpu.models.dense_heads import TransformerHead
        cfg = tiny_detr_cfg()['bbox_head']
        cfg.pop('type')
        head = TransformerHead(**cfg, test_cfg=dict(max_per_img=20))
        cls1, box1 = head.apply(head_vars, feats, batch['img_shapes'])
        f = feats[-1]
        garbage = jnp.pad(f, ((0, 0), (0, 2), (0, 3), (0, 0)),
                          constant_values=7.5)
        cls2, box2 = head.apply(head_vars, (garbage,),
                                batch['img_shapes'])
        np.testing.assert_allclose(np.asarray(cls1), np.asarray(cls2),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(box1), np.asarray(box2),
                                   rtol=1e-4, atol=1e-4)


class TestSparseRCNNForward:
    def test_forward_train_losses(self, sparse_model):
        model, variables, batch = sparse_model
        losses = model.apply(
            variables, batch['img'], batch['img_shapes'],
            batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
            batch['gt_labels'], method='forward_train',
            rngs={'sampling': jax.random.PRNGKey(2)})
        for st in range(2):
            for k in ('loss_cls', 'loss_bbox', 'loss_iou'):
                key = f'stage{st}_{k}'
                assert key in losses and np.isfinite(float(losses[key]))

    def test_forward_train_empty_gt(self, sparse_model):
        model, variables, batch = sparse_model
        losses = model.apply(
            variables, batch['img'], batch['img_shapes'],
            batch['pad_shapes'], batch['gt_bboxes'],
            jnp.zeros_like(batch['gt_valid']), batch['gt_labels'],
            method='forward_train',
            rngs={'sampling': jax.random.PRNGKey(2)})
        for k, v in losses.items():
            assert np.isfinite(float(v)), k

    def test_simple_test_shapes(self, sparse_model):
        model, variables, batch = sparse_model
        out = model.apply(variables, batch['img'], batch['img_shapes'],
                          jnp.ones((2, 4), jnp.float32),
                          method='simple_test')
        assert out['dets'].shape == (2, 16, 5)
        assert out['labels'].shape == (2, 16)
        s = np.asarray(out['dets'][..., 4])
        assert ((s >= 0) & (s <= 1)).all()

    def test_grads_flow(self, sparse_model):
        """stop_gradient on proposals must not sever the loss->param
        path through cls/reg branches."""
        model, variables, batch = sparse_model

        def loss_fn(params):
            losses = model.apply(
                {**variables, 'params': params}, batch['img'],
                batch['img_shapes'],
                batch['pad_shapes'], batch['gt_bboxes'],
                batch['gt_valid'], batch['gt_labels'],
                method='forward_train',
                rngs={'sampling': jax.random.PRNGKey(2)})
            return sum(jnp.sum(v) for v in losses.values())

        grads = jax.grad(loss_fn)(variables['params'])
        leaves = jax.tree_util.tree_leaves(grads)
        gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
        assert np.isfinite(gnorm) and gnorm > 0
