"""CornerNet: corner pool op, gaussian targets, AE loss, hourglass
backbone, end-to-end forward."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swindet_tpu.models import build_detector

from tests.test_models.test_forward import demo_inputs


def test_corner_pool_directions():
    from swindet_tpu.ops.corner_pool import corner_pool
    x = jnp.asarray(np.random.RandomState(0).rand(1, 5, 6, 3)
                    .astype(np.float32))
    top = corner_pool(x, 'top')
    # top pool: running max from the bottom upward
    ref = np.maximum.accumulate(np.asarray(x)[:, ::-1], axis=1)[:, ::-1]
    np.testing.assert_allclose(np.asarray(top), ref, rtol=1e-6)
    right = corner_pool(x, 'right')
    ref = np.maximum.accumulate(np.asarray(x), axis=2)
    np.testing.assert_allclose(np.asarray(right), ref, rtol=1e-6)


def test_gaussian_radius_matches_reference_cases():
    from swindet_tpu.models.dense_heads.corner_head import gaussian_radius
    # values computed with the reference torch implementation
    r = float(gaussian_radius((jnp.asarray(10.), jnp.asarray(20.)), 0.3))
    assert r == pytest.approx(2.8902, abs=1e-3)
    r2 = float(gaussian_radius((jnp.asarray(50.), jnp.asarray(50.)), 0.3))
    assert r2 == pytest.approx(11.3069, abs=1e-3)


def tiny_cornernet_cfg():
    return dict(
        type='CornerNet',
        backbone=dict(type='HourglassNet', downsample_times=3,
                      num_stacks=2, stage_channels=[16, 16, 24, 24],
                      stage_blocks=[1, 1, 1, 1], feat_channel=16),
        neck=None,
        bbox_head=dict(
            type='CornerHead', num_classes=4, in_channels=16,
            num_feat_levels=2, corner_emb_channels=1,
            loss_heatmap=dict(type='GaussianFocalLoss', alpha=2.0,
                              gamma=4.0, loss_weight=1),
            loss_embedding=dict(type='AssociativeEmbeddingLoss',
                                pull_weight=0.10, push_weight=0.10),
            loss_offset=dict(type='SmoothL1Loss', beta=1.0,
                             loss_weight=1)),
        train_cfg=None,
        test_cfg=dict(corner_topk=20, local_maximum_kernel=3,
                      distance_threshold=0.5, num_dets=64,
                      max_per_img=16,
                      nms=dict(type='soft_nms', iou_threshold=0.5,
                               method='gaussian')))


def test_cornernet_forward():
    model = build_detector(tiny_cornernet_cfg())
    batch = demo_inputs(b=2, h=64, w=64, with_mask=False)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'], method='forward_dummy')
    losses = model.apply(
        variables, batch['img'], batch['img_shapes'],
        batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
        batch['gt_labels'], method='forward_train',
        rngs={'sampling': jax.random.PRNGKey(2)},
        mutable=['batch_stats'])[0]
    for k in ('det_loss', 'off_loss', 'pull_loss', 'push_loss'):
        assert np.isfinite(float(losses[k])), f'{k} not finite'
    assert float(losses['det_loss']) > 0
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)
    assert np.all(np.isfinite(np.asarray(out['dets'])))


def test_corner_targets_peak_at_corners():
    """Heatmap target is exactly 1 at each gt corner cell, offsets
    stored there; matches the reference's painted values."""
    from swindet_tpu.models.builder import build_head
    head = build_head(dict(type='CornerHead', num_classes=3,
                           in_channels=8, num_feat_levels=1))
    gt = jnp.asarray([[[8., 12., 40., 36.], [0., 0., 0., 0.]]])
    valid = jnp.asarray([[True, False]])
    labels = jnp.asarray([[1, 0]], jnp.int32)
    t = head.get_targets(gt, valid, labels, (16, 16),
                         jnp.asarray([[64, 64]], jnp.int32))
    tl = np.asarray(t['tl_heat'])
    # corner cell: (12, 8) * 16/64 = (3, 2)
    assert tl[0, 3, 2, 1] == 1.0
    assert tl[0].max() == 1.0
    assert tl[0, :, :, 0].max() == 0.0  # only class 1 painted
    br = np.asarray(t['br_heat'])
    assert br[0, 9, 10, 1] == 1.0
    off = np.asarray(t['tl_off'])
    np.testing.assert_allclose(off[0, 3, 2], [0.0, 0.0], atol=1e-5)


def test_soft_nms_decays_overlaps():
    from swindet_tpu.core.nms import soft_nms
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11],
                         [50, 50, 60, 60]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7], jnp.float32)
    res = soft_nms(boxes, scores, method='gaussian', sigma=0.5)
    out_scores = np.asarray(res.dets[:, 4])
    assert out_scores[0] == pytest.approx(0.9)
    # heavy overlap with the first box -> decayed below its raw score
    decayed = out_scores[np.asarray(res.inds) == 1][0]
    assert decayed < 0.5
    far = out_scores[np.asarray(res.inds) == 2][0]
    assert far == pytest.approx(0.7, abs=1e-3)


def tiny_centripetalnet_cfg():
    cfg = tiny_cornernet_cfg()
    cfg['type'] = 'CentripetalNet'
    cfg['bbox_head'] = dict(
        type='CentripetalHead', num_classes=4, in_channels=16,
        num_feat_levels=2, corner_emb_channels=0,
        loss_heatmap=dict(type='GaussianFocalLoss', alpha=2.0,
                          gamma=4.0, loss_weight=1),
        loss_offset=dict(type='SmoothL1Loss', beta=1.0, loss_weight=1),
        loss_guiding_shift=dict(type='SmoothL1Loss', beta=1.0,
                                loss_weight=0.05),
        loss_centripetal_shift=dict(type='SmoothL1Loss', beta=1.0,
                                    loss_weight=1))
    return cfg


def test_centripetalnet_forward():
    model = build_detector(tiny_centripetalnet_cfg())
    batch = demo_inputs(b=2, h=64, w=64, with_mask=False)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'], method='forward_dummy')
    losses = model.apply(
        variables, batch['img'], batch['img_shapes'],
        batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
        batch['gt_labels'], method='forward_train',
        rngs={'sampling': jax.random.PRNGKey(2)},
        mutable=['batch_stats'])[0]
    for k in ('det_loss', 'off_loss', 'guiding_loss',
              'centripetal_loss'):
        assert np.isfinite(float(losses[k])), f'{k} not finite'
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)
    assert np.all(np.isfinite(np.asarray(out['dets'])))


def tiny_yolact_cfg():
    return dict(
        type='YOLACT',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(1, 2, 3)),
        neck=dict(type='FPN', in_channels=[32, 64, 128], out_channels=16,
                  start_level=0, add_extra_convs='on_input', num_outs=5,
                  upsample_cfg=dict(mode='bilinear')),
        bbox_head=dict(
            type='YOLACTHead', num_classes=4, in_channels=16,
            feat_channels=16, num_head_convs=1, num_protos=8,
            use_ohem=True,
            anchor_generator=dict(type='AnchorGenerator',
                                  octave_base_scale=3,
                                  scales_per_octave=1,
                                  ratios=[0.5, 1.0, 2.0],
                                  strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0., 0., 0., 0.],
                            target_stds=[0.1, 0.1, 0.2, 0.2]),
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                          reduction='none', loss_weight=1.0),
            loss_bbox=dict(type='SmoothL1Loss', beta=1.0,
                           loss_weight=1.5)),
        segm_head=dict(type='YOLACTSegmHead', num_classes=4,
                       in_channels=16),
        mask_head=dict(type='YOLACTProtonet', num_classes=4,
                       in_channels=16, num_protos=8,
                       proto_channels=(16, 16, 8),
                       proto_kernel_sizes=(3, 3, 1),
                       max_masks_to_train=16),
        train_cfg=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.4, min_pos_iou=0.,
                          ignore_iof_thr=-1, gt_max_assign_all=False),
            smoothl1_beta=1.0, allowed_border=-1, pos_weight=-1,
            neg_pos_ratio=3),
        test_cfg=dict(nms_pre=64, min_bbox_size=0, score_thr=0.05,
                      nms=dict(type='fast_nms', iou_threshold=0.5,
                               top_k=32),
                      top_k=32, max_per_img=16))


def test_yolact_forward():
    model = build_detector(tiny_yolact_cfg())
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
    for k in ('loss_cls', 'loss_bbox', 'loss_segm', 'loss_mask'):
        assert np.isfinite(float(losses[k])), f'{k} not finite'
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)
    # full proto-res masks (reference get_seg_masks interpolates the
    # whole proto map to ori shape; host pipeline does the same)
    mp = out['mask_probs_full']
    assert mp.shape[:2] == (2, 16) and mp.ndim == 4
    assert np.all(np.isfinite(np.asarray(mp)))


def test_fast_nms_keeps_distinct():
    from swindet_tpu.core.nms import fast_nms
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11],
                         [40, 40, 60, 60]], jnp.float32)
    scores = jnp.asarray([[0.9, 0.0], [0.8, 0.0], [0.7, 0.0]],
                         jnp.float32)
    scores = jnp.concatenate([scores,
                              jnp.zeros((3, 1), jnp.float32)], -1)
    coeffs = jnp.ones((3, 4), jnp.float32)
    res = fast_nms(boxes, scores, coeffs, 0.05, 0.5, 3, 4)
    kept = np.asarray(res.valid)
    dets = np.asarray(res.dets)
    # box 1 overlaps box 0 above thr -> suppressed; 0 and 2 kept
    assert kept.sum() == 2
    assert dets[0, 4] == pytest.approx(0.9)
