"""PointRend: coarse head shapes, point-head MLP, train loss, test
subdivision refinement."""
import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swindet_tpu.models import build_detector

from tests.test_models.test_forward import demo_inputs, tiny_maskrcnn_cfg


def tiny_pointrend_cfg():
    cfg = copy.deepcopy(tiny_maskrcnn_cfg(with_mask=True))
    cfg['roi_head'].update(
        type='PointRendRoIHead',
        mask_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=14,
                           sampling_ratio=0),
            out_channels=32, featmap_strides=[4]),
        mask_head=dict(
            type='CoarseMaskHead', num_fcs=2, in_channels=32,
            conv_out_channels=32, fc_out_channels=64, num_classes=4,
            loss_mask=dict(type='CrossEntropyLoss', use_mask=True,
                           loss_weight=1.0)),
        point_head=dict(
            type='MaskPointHead', num_fcs=3, in_channels=32,
            fc_channels=32, num_classes=4,
            coarse_pred_each_layer=True,
            loss_point=dict(type='CrossEntropyLoss', use_mask=True,
                            loss_weight=1.0)))
    cfg['train_cfg']['rcnn'].update(mask_size=7, num_points=16,
                                    oversample_ratio=3,
                                    importance_sample_ratio=0.75)
    cfg['test_cfg']['rcnn'].update(subdivision_steps=2,
                                   subdivision_num_points=64,
                                   scale_factor=2)
    return cfg


def test_pointrend_forward():
    model = build_detector(tiny_pointrend_cfg())
    batch = demo_inputs(b=2, h=64, w=64, with_mask=True)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'], method='forward_dummy')
    losses = model.apply(
        variables, batch['img'], batch['img_shapes'],
        batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
        batch['gt_labels'], batch['gt_masks'], method='forward_train',
        rngs={'sampling': jax.random.PRNGKey(2)})
    for k in ('loss_cls', 'loss_bbox', 'loss_mask', 'loss_point'):
        assert np.isfinite(float(losses[k])), f'{k} not finite'
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)
    # coarse 7x7 refined 2 subdivision steps -> 28x28
    assert out['mask_probs'].shape == (2, 16, 28, 28)
    assert np.all(np.isfinite(np.asarray(out['mask_probs'])))


def test_point_head_uncertainty_selects_boundary():
    """Uncertainty peaks where |logit| is smallest for the roi's class."""
    from swindet_tpu.models.builder import build_head
    head = build_head(dict(type='MaskPointHead', num_classes=3,
                           in_channels=8, fc_channels=8))
    logits = jnp.asarray(
        np.stack([np.full((4, 3), 5.0)]), jnp.float32)      # (1, 4, 3)
    logits = logits.at[0, 2, 1].set(0.05)
    unc = head.uncertainty(logits, jnp.asarray([1]))
    assert int(jnp.argmax(unc[0])) == 2


def tiny_grid_rcnn_cfg():
    cfg = copy.deepcopy(tiny_maskrcnn_cfg(with_mask=False))
    cfg['type'] = 'GridRCNN'
    cfg['roi_head'].update(
        type='GridRoIHead',
        bbox_head=dict(cfg['roi_head']['bbox_head'], with_reg=False),
        grid_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=14,
                           sampling_ratio=0),
            out_channels=32, featmap_strides=[4, 8, 16, 32]),
        grid_head=dict(type='GridHead', grid_points=9, num_convs=2,
                       in_channels=32, point_feat_channels=8,
                       norm_cfg=dict(type='GN', num_groups=9),
                       loss_grid=dict(type='CrossEntropyLoss',
                                      use_sigmoid=True, loss_weight=15)))
    cfg['train_cfg']['rcnn'].update(pos_radius=1, max_num_grid=32)
    return cfg


def test_grid_rcnn_forward():
    model = build_detector(tiny_grid_rcnn_cfg())
    batch = demo_inputs(b=2, h=64, w=64, with_mask=False)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'], method='forward_dummy')
    losses = model.apply(
        variables, batch['img'], batch['img_shapes'],
        batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
        batch['gt_labels'], method='forward_train',
        rngs={'sampling': jax.random.PRNGKey(2)})
    for k in ('loss_cls', 'loss_grid'):
        assert np.isfinite(float(losses[k])), f'{k} not finite'
    assert 'loss_bbox' not in losses  # classification-only bbox head
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)
    assert np.all(np.isfinite(np.asarray(out['dets'])))


def test_grid_targets_circle():
    """Grid point target paints a radius-r circle at the projected gt
    corner inside the point's sub-region."""
    from swindet_tpu.models.builder import build_head
    head = build_head(dict(type='GridHead', grid_points=9, num_convs=1,
                           in_channels=8, point_feat_channels=8,
                           norm_cfg=dict(type='GN', num_groups=9)))
    pos = jnp.asarray([[10., 10., 40., 40.]])
    gt = jnp.asarray([[12., 12., 38., 38.]])
    t = head.get_targets(pos, gt, pos_radius=1)
    assert t.shape == (1, 28, 28, 9)
    assert float(t.sum()) > 0          # circles painted
    assert float(t.max()) == 1.0
