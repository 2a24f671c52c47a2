"""End-to-end model forward tests on synthetic inputs — the framework's
main safety net (reference test model: tests/test_models/test_forward.py
_demo_mm_inputs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swindet_tpu.models import build_detector


def tiny_maskrcnn_cfg(with_mask=True):
    """Mask R-CNN Swin-nano on tiny shapes (same graph as
    configs/_base_/models/mask_rcnn_swin_fpn.py, scaled down)."""
    return dict(
        type='MaskRCNN',
        backbone=dict(
            type='SwinTransformer', embed_dim=32, depths=[1, 1, 1, 1],
            num_heads=[1, 2, 4, 8], window_size=7, mlp_ratio=4.0,
            drop_path_rate=0.0, patch_norm=True, out_indices=(0, 1, 2, 3)),
        neck=dict(type='FPN', in_channels=[32, 64, 128, 256],
                  out_channels=32, num_outs=5),
        rpn_head=dict(
            type='RPNHead', in_channels=32, feat_channels=32,
            anchor_generator=dict(type='AnchorGenerator', scales=[8],
                                  ratios=[0.5, 1.0, 2.0],
                                  strides=[4, 8, 16, 32, 64]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0., 0., 0., 0.],
                            target_stds=[1., 1., 1., 1.]),
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                          loss_weight=1.0),
            loss_bbox=dict(type='L1Loss', loss_weight=1.0)),
        roi_head=dict(
            type='StandardRoIHead',
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=7,
                               sampling_ratio=0),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(
                type='Shared2FCBBoxHead', in_channels=32,
                fc_out_channels=64, roi_feat_size=7, num_classes=4,
                bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                target_means=[0., 0., 0., 0.],
                                target_stds=[0.1, 0.1, 0.2, 0.2]),
                reg_class_agnostic=False,
                loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                              loss_weight=1.0),
                loss_bbox=dict(type='L1Loss', loss_weight=1.0)),
            mask_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=14,
                               sampling_ratio=0),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            mask_head=dict(
                type='FCNMaskHead', num_convs=2, in_channels=32,
                conv_out_channels=32, num_classes=4,
                loss_mask=dict(type='CrossEntropyLoss', use_mask=True,
                               loss_weight=1.0)) if with_mask else None),
        train_cfg=dict(
            rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                                   neg_iou_thr=0.3, min_pos_iou=0.3,
                                   match_low_quality=True,
                                   ignore_iof_thr=-1),
                     sampler=dict(type='RandomSampler', num=64,
                                  pos_fraction=0.5, neg_pos_ub=-1,
                                  add_gt_as_proposals=False),
                     allowed_border=-1, pos_weight=-1),
            rpn_proposal=dict(nms_pre=128, max_per_img=64,
                              nms=dict(type='nms', iou_threshold=0.7),
                              min_bbox_size=0),
            rcnn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                    neg_iou_thr=0.5, min_pos_iou=0.5,
                                    match_low_quality=True,
                                    ignore_iof_thr=-1),
                      sampler=dict(type='RandomSampler', num=32,
                                   pos_fraction=0.25, neg_pos_ub=-1,
                                   add_gt_as_proposals=True),
                      mask_size=28, pos_weight=-1)),
        test_cfg=dict(
            rpn=dict(nms_pre=128, max_per_img=64,
                     nms=dict(type='nms', iou_threshold=0.7),
                     min_bbox_size=0),
            rcnn=dict(score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=16, mask_thr_binary=0.5)))


def demo_inputs(b=2, h=64, w=64, g=3, num_classes=4, with_mask=True,
                seed=0):
    rs = np.random.RandomState(seed)
    img = rs.randn(b, h, w, 3).astype(np.float32)
    gt_bboxes = np.zeros((b, g, 4), np.float32)
    gt_valid = np.zeros((b, g), bool)
    gt_labels = np.zeros((b, g), np.int32)
    for i in range(b):
        n = max(g - i, 1)  # vary #gts per image
        cx = rs.rand(n) * w * 0.6 + w * 0.2
        cy = rs.rand(n) * h * 0.6 + h * 0.2
        bw = rs.rand(n) * w * 0.3 + 8
        bh = rs.rand(n) * h * 0.3 + 8
        gt_bboxes[i, :n] = np.stack(
            [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
        gt_valid[i, :n] = True
        gt_labels[i, :n] = rs.randint(0, num_classes, n)
    batch = dict(
        img=jnp.asarray(img),
        img_shapes=jnp.asarray([[h, w]] * b, jnp.int32),
        pad_shapes=jnp.asarray([[h, w]] * b, jnp.int32),
        gt_bboxes=jnp.asarray(gt_bboxes),
        gt_valid=jnp.asarray(gt_valid),
        gt_labels=jnp.asarray(gt_labels),
    )
    if with_mask:
        masks = np.zeros((b, g, h, w), np.float32)
        for i in range(b):
            for j in range(g):
                x1, y1, x2, y2 = gt_bboxes[i, j].astype(int)
                masks[i, j, y1:y2, x1:x2] = 1.0
        batch['gt_masks'] = jnp.asarray(masks)
    return batch


@pytest.fixture(scope='module')
def model_and_params():
    model = build_detector(tiny_maskrcnn_cfg())
    batch = demo_inputs()
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'], method='forward_dummy')
    return model, variables, batch


class TestMaskRCNNForward:
    def test_extract_feat_shapes(self, model_and_params):
        model, variables, batch = model_and_params
        feats = model.apply(variables, batch['img'])
        assert len(feats) == 5
        h, w = batch['img'].shape[1:3]
        for lvl, f in enumerate(feats):
            stride = 4 * 2 ** lvl
            assert f.shape == (2, h // stride, w // stride, 32)

    def test_forward_train_losses(self, model_and_params):
        model, variables, batch = model_and_params
        losses = model.apply(
            variables, batch['img'], batch['img_shapes'],
            batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
            batch['gt_labels'], batch['gt_masks'],
            method='forward_train',
            rngs={'sampling': jax.random.PRNGKey(2),
                  'dropout': jax.random.PRNGKey(3)})
        for k in ('loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls', 'loss_bbox',
                  'loss_mask'):
            assert k in losses, f'missing {k}'
            v = float(losses[k])
            assert np.isfinite(v), f'{k} not finite'
            assert v >= 0 or k == 'acc'
        assert float(losses['loss_cls']) > 0

    def test_forward_train_empty_gt(self, model_and_params):
        model, variables, batch = model_and_params
        empty = dict(batch)
        empty['gt_valid'] = jnp.zeros_like(batch['gt_valid'])
        losses = model.apply(
            variables, empty['img'], empty['img_shapes'],
            empty['pad_shapes'], empty['gt_bboxes'], empty['gt_valid'],
            empty['gt_labels'], empty['gt_masks'],
            method='forward_train',
            rngs={'sampling': jax.random.PRNGKey(2),
                  'dropout': jax.random.PRNGKey(3)})
        for k, v in losses.items():
            assert np.isfinite(float(v)), f'{k} not finite with empty gt'

    def test_simple_test(self, model_and_params):
        model, variables, batch = model_and_params
        scale_factors = jnp.ones((2, 4), jnp.float32)
        out = model.apply(variables, batch['img'], batch['img_shapes'],
                          scale_factors, method='simple_test')
        assert out['dets'].shape == (2, 16, 5)
        assert out['labels'].shape == (2, 16)
        assert out['det_valid'].shape == (2, 16)
        assert out['mask_probs'].shape == (2, 16, 28, 28)
        assert np.all(np.isfinite(np.asarray(out['dets'])))

    def test_simple_test_jit(self, model_and_params):
        model, variables, batch = model_and_params
        scale_factors = jnp.ones((2, 4), jnp.float32)

        @jax.jit
        def run(v, img, shapes, sf):
            return model.apply(v, img, shapes, sf, method='simple_test')

        out = run(variables, batch['img'], batch['img_shapes'],
                  scale_factors)
        assert out['dets'].shape == (2, 16, 5)

    def test_train_grads_finite(self, model_and_params):
        model, variables, batch = model_and_params

        def loss_fn(params):
            losses = model.apply(
                {'params': params}, batch['img'], batch['img_shapes'],
                batch['pad_shapes'], batch['gt_bboxes'],
                batch['gt_valid'], batch['gt_labels'], batch['gt_masks'],
                method='forward_train',
                rngs={'sampling': jax.random.PRNGKey(2),
                      'dropout': jax.random.PRNGKey(3)})
            return sum(v for k, v in losses.items() if 'loss' in k)

        grads = jax.grad(loss_fn)(variables['params'])
        leaves = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        # every parameter must receive gradient signal somewhere
        nonzero = sum(float(np.abs(np.asarray(g)).sum()) > 0
                      for g in leaves)
        assert nonzero > len(leaves) * 0.7


def test_mask_scoring_forward():
    """MS R-CNN: mask-iou branch trains and mask_scores at test
    (reference: mask_scoring_roi_head.py)."""
    cfg = tiny_maskrcnn_cfg()
    cfg['type'] = 'MaskScoringRCNN'
    cfg['roi_head']['type'] = 'MaskScoringRoIHead'
    out_ch = cfg['roi_head']['bbox_roi_extractor']['out_channels']
    cfg['roi_head']['mask_iou_head'] = dict(
        type='MaskIoUHead', num_convs=2, num_fcs=1, roi_feat_size=14,
        in_channels=out_ch, conv_out_channels=out_ch,
        fc_out_channels=32, num_classes=4)
    model = build_detector(cfg)
    batch = demo_inputs(b=2, h=64, w=64)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'][:1], method='forward_dummy')
    losses = model.apply(
        variables, batch['img'], batch['img_shapes'],
        batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
        batch['gt_labels'], batch['gt_masks'], method='forward_train',
        rngs={'sampling': jax.random.PRNGKey(2)})
    assert 'loss_mask_iou' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert 'mask_scores' in out
    assert out['mask_scores'].shape == out['labels'].shape
    assert np.all(np.isfinite(np.asarray(out['mask_scores'])))


def test_double_head_forward():
    """Double-Head R-CNN: fc-cls + conv-reg branches, enlarged reg RoIs
    (reference: double_roi_head.py, double_bbox_head.py)."""
    cfg = tiny_maskrcnn_cfg(with_mask=False)
    cfg['type'] = 'FasterRCNN'
    cfg['roi_head'].pop('mask_head', None)
    cfg['roi_head'].pop('mask_roi_extractor', None)
    cfg['roi_head']['type'] = 'DoubleHeadRoIHead'
    cfg['roi_head']['reg_roi_scale_factor'] = 1.3
    bh = cfg['roi_head']['bbox_head']
    bh['type'] = 'DoubleConvFCBBoxHead'
    bh['num_convs'] = 2
    bh['num_fcs'] = 1
    bh['conv_out_channels'] = 32
    model = build_detector(cfg)
    batch = demo_inputs(b=2, h=64, w=64, with_mask=False)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'][:1], method='forward_dummy')
    losses, _ = model.apply(
        variables, batch['img'], batch['img_shapes'],
        batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
        batch['gt_labels'], None, method='forward_train',
        rngs={'sampling': jax.random.PRNGKey(2)},
        mutable=['batch_stats'])
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32), method='simple_test')
    assert np.all(np.isfinite(np.asarray(out['dets'])))


def test_dynamic_rcnn_forward():
    """Dynamic R-CNN: adaptive IoU thr / SmoothL1 beta tracked in the
    jitted 'dynamic' collection (reference: dynamic_roi_head.py)."""
    cfg = tiny_maskrcnn_cfg(with_mask=False)
    cfg['type'] = 'FasterRCNN'
    cfg['roi_head'].pop('mask_head', None)
    cfg['roi_head'].pop('mask_roi_extractor', None)
    cfg['roi_head']['type'] = 'DynamicRoIHead'
    cfg['roi_head']['bbox_head']['loss_bbox'] = dict(
        type='SmoothL1Loss', beta=1.0, loss_weight=1.0)
    cfg['train_cfg']['rcnn']['dynamic_rcnn'] = dict(
        iou_topk=8, beta_topk=2, update_iter_interval=2,
        initial_iou=0.4, initial_beta=1.0)
    model = build_detector(cfg)
    batch = demo_inputs(b=2, h=64, w=64, with_mask=False)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'][:1], method='forward_dummy')
    assert 'dynamic' in variables
    dyn = variables['dynamic']
    for step in range(3):
        losses, upd = model.apply(
            {'params': variables['params'], 'dynamic': dyn},
            batch['img'], batch['img_shapes'], batch['pad_shapes'],
            batch['gt_bboxes'], batch['gt_valid'], batch['gt_labels'],
            None, method='forward_train',
            rngs={'sampling': jax.random.PRNGKey(step)},
            mutable=['dynamic'])
        dyn = upd['dynamic']
        for k, v in losses.items():
            assert np.isfinite(float(v)), f'{k} not finite'
    rh = dyn['_roi_head']
    assert int(rh['count']) == 3
    # thresholds stay in sane ranges (update fired at count 2)
    assert float(rh['iou_thr']) >= 0.4
    assert 0 < float(rh['beta']) <= 1.0


def test_pisa_forward():
    """PISA: ISR-P reweighting + CARL loss (reference: pisa_loss.py,
    pisa_roi_head.py)."""
    cfg = tiny_maskrcnn_cfg(with_mask=False)
    cfg['type'] = 'FasterRCNN'
    cfg['roi_head'].pop('mask_head', None)
    cfg['roi_head'].pop('mask_roi_extractor', None)
    cfg['roi_head']['type'] = 'PISARoIHead'
    cfg['train_cfg']['rcnn']['isr'] = dict(k=2, bias=0)
    cfg['train_cfg']['rcnn']['carl'] = dict(k=1, bias=0.2)
    model = build_detector(cfg)
    batch = demo_inputs(b=2, h=64, w=64, with_mask=False)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'][:1], method='forward_dummy')
    losses = model.apply(
        variables, batch['img'], batch['img_shapes'],
        batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
        batch['gt_labels'], None, method='forward_train',
        rngs={'sampling': jax.random.PRNGKey(2)})
    assert 'loss_carl' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'
