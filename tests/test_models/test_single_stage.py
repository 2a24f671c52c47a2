"""Forward tests for single-stage detectors (RetinaNet, RepPoints) and
the ResNet backbone on tiny synthetic inputs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swindet_tpu.models import build_detector, ResNet

from tests.test_models.test_forward import demo_inputs


def tiny_retinanet_cfg():
    return dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(1, 2, 3)),
        neck=dict(type='FPN', in_channels=[32, 64, 128], out_channels=16,
                  start_level=0, add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(
            type='RetinaHead', num_classes=4, in_channels=16,
            feat_channels=16, stacked_convs=1,
            anchor_generator=dict(type='AnchorGenerator',
                                  octave_base_scale=4,
                                  scales_per_octave=3,
                                  ratios=[0.5, 1.0, 2.0],
                                  strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0., 0., 0., 0.],
                            target_stds=[1., 1., 1., 1.]),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0),
            loss_bbox=dict(type='L1Loss', loss_weight=1.0)),
        train_cfg=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.4, min_pos_iou=0,
                          match_low_quality=True, ignore_iof_thr=-1),
            sampler=dict(type='PseudoSampler', num=64),
            allowed_border=-1, pos_weight=-1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=16))


def tiny_reppoints_cfg():
    return dict(
        type='RepPointsDetector',
        backbone=dict(type='SwinTransformer', embed_dim=32,
                      depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8],
                      window_size=7, drop_path_rate=0.0),
        neck=dict(type='FPN', in_channels=[32, 64, 128, 256],
                  out_channels=32, start_level=1, add_extra_convs=
                  'on_input', num_outs=5),
        bbox_head=dict(
            type='RepPointsHead', num_classes=4, in_channels=32,
            feat_channels=32, point_feat_channels=32, stacked_convs=1,
            num_points=9, gradient_mul=0.1,
            point_strides=[8, 16, 32, 64, 128], point_base_scale=4,
            transform_method='moment',
            loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0)),
        train_cfg=dict(
            init=dict(assigner=dict(type='PointAssigner', scale=4,
                                    pos_num=1),
                      allowed_border=-1, pos_weight=-1),
            refine=dict(assigner=dict(type='MaxIoUAssigner',
                                      pos_iou_thr=0.5, neg_iou_thr=0.4,
                                      min_pos_iou=0,
                                      match_low_quality=True,
                                      ignore_iof_thr=-1),
                        allowed_border=-1, pos_weight=-1)),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=16))


def test_resnet_shapes(rng):
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    bb = ResNet(depth=18, base_channels=16)
    v = bb.init(jax.random.PRNGKey(0), x)
    outs = bb.apply(v, x)
    assert len(outs) == 4
    for i, o in enumerate(outs):
        stride = 4 * 2 ** i
        assert o.shape[1] == 64 // stride
    # bottleneck variant
    bb50 = ResNet(depth=50, base_channels=16)
    v = bb50.init(jax.random.PRNGKey(0), x)
    outs = bb50.apply(v, x)
    assert outs[0].shape[-1] == 64  # 16 * expansion 4


@pytest.mark.parametrize('cfg_fn', [tiny_retinanet_cfg,
                                    tiny_reppoints_cfg])
def test_single_stage_forward(cfg_fn):
    model = build_detector(cfg_fn())
    batch = demo_inputs(b=2, h=64, w=64, with_mask=False)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'], method='forward_dummy')
    losses = model.apply(
        variables, batch['img'], batch['img_shapes'],
        batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
        batch['gt_labels'], method='forward_train',
        rngs={'sampling': jax.random.PRNGKey(2),
              'dropout': jax.random.PRNGKey(3)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    assert float(losses['loss_cls']) > 0

    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)
    assert np.all(np.isfinite(np.asarray(out['dets'])))


def tiny_fcos_cfg():
    return dict(
        type='FCOS',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(1, 2, 3)),
        neck=dict(type='FPN', in_channels=[32, 64, 128], out_channels=16,
                  start_level=0, add_extra_convs='on_output', num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=dict(
            type='FCOSHead', num_classes=4, in_channels=16,
            feat_channels=16, stacked_convs=1,
            strides=[8, 16, 32, 64, 128]),
        train_cfg=dict(),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=16))


def test_fcos_forward():
    model = build_detector(tiny_fcos_cfg())
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
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32), method='simple_test')
    assert out['dets'].shape == (2, 16, 5)


def test_pafpn_shapes(rng):
    from swindet_tpu.models.necks import PAFPN
    ins = [jnp.asarray(rng.randn(1, 64 // s, 64 // s, c).astype(np.float32))
           for s, c in [(4, 32), (8, 64), (16, 128), (32, 256)]]
    neck = PAFPN(in_channels=[32, 64, 128, 256], out_channels=16,
                 num_outs=5)
    v = neck.init(jax.random.PRNGKey(0), ins)
    outs = neck.apply(v, ins)
    assert len(outs) == 5
    for i, o in enumerate(outs[:4]):
        assert o.shape == (1, 64 // (4 * 2 ** i), 64 // (4 * 2 ** i), 16)


def tiny_atss_cfg():
    return dict(
        type='ATSS',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(1, 2, 3)),
        neck=dict(type='FPN', in_channels=[32, 64, 128], out_channels=16,
                  start_level=0, add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(
            type='ATSSHead', num_classes=4, in_channels=16,
            feat_channels=16, stacked_convs=1,
            norm_cfg=dict(type='GN', num_groups=4),
            anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                                  octave_base_scale=8, scales_per_octave=1,
                                  strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0., 0., 0., 0.],
                            target_stds=[0.1, 0.1, 0.2, 0.2]),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0),
            loss_bbox=dict(type='GIoULoss', loss_weight=2.0),
            loss_centerness=dict(type='CrossEntropyLoss', use_sigmoid=True,
                                 loss_weight=1.0)),
        train_cfg=dict(assigner=dict(type='ATSSAssigner', topk=9),
                       allowed_border=-1, pos_weight=-1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=16))


def tiny_gfl_cfg():
    cfg = tiny_atss_cfg()
    cfg.update(type='GFL')
    cfg['bbox_head'] = dict(
        type='GFLHead', num_classes=4, in_channels=16, feat_channels=16,
        stacked_convs=1, reg_max=8,
        norm_cfg=dict(type='GN', num_groups=4),
        anchor_generator=cfg['bbox_head']['anchor_generator'],
        bbox_coder=cfg['bbox_head']['bbox_coder'],
        loss_cls=dict(type='QualityFocalLoss', use_sigmoid=True,
                      beta=2.0, loss_weight=1.0),
        loss_dfl=dict(type='DistributionFocalLoss', loss_weight=0.25),
        loss_bbox=dict(type='GIoULoss', loss_weight=2.0))
    return cfg


@pytest.mark.parametrize('cfg_fn', [tiny_atss_cfg, tiny_gfl_cfg])
def test_atss_gfl_forward(cfg_fn):
    model = build_detector(cfg_fn())
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
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    assert float(losses['loss_cls']) > 0
    assert float(losses['loss_bbox']) > 0
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32), method='simple_test')
    assert out['dets'].shape == (2, 16, 5)
    assert np.all(np.isfinite(np.asarray(out['dets'])))


def test_ssd_forward():
    """SSD300 at reduced canvas: SSDVGG feature pyramid + SSD head with
    hard-negative-mined loss (reference: ssd_head.py, ssd_vgg.py)."""
    cfg = dict(
        type='SingleStageDetector',
        backbone=dict(type='SSDVGG', input_size=300, depth=16,
                      out_indices=(3, 4), out_feature_indices=(22, 34),
                      l2_norm_scale=20),
        neck=None,
        bbox_head=dict(
            type='SSDHead', in_channels=(512, 1024, 512, 256, 256, 256),
            num_classes=4,
            anchor_generator=dict(
                type='SSDAnchorGenerator', scale_major=False,
                input_size=300, basesize_ratio_range=(0.15, 0.9),
                strides=[8, 16, 32, 64, 100, 300],
                ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[.0, .0, .0, .0],
                            target_stds=[0.1, 0.1, 0.2, 0.2])),
        train_cfg=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.5, min_pos_iou=0.,
                          ignore_iof_thr=-1, gt_max_assign_all=False),
            smoothl1_beta=1., allowed_border=-1, pos_weight=-1,
            neg_pos_ratio=3),
        test_cfg=dict(nms_pre=100,
                      nms=dict(type='nms', iou_threshold=0.45),
                      min_bbox_size=0, score_thr=0.02, max_per_img=16))
    model = build_detector(cfg)
    img = jnp.zeros((1, 300, 300, 3), jnp.float32)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        img, method='forward_dummy')
    feats = model.apply(variables, img)
    # exact reference pyramid (ssd_vgg.py docstring)
    assert [tuple(f.shape) for f in feats] == [
        (1, 38, 38, 512), (1, 19, 19, 1024), (1, 10, 10, 512),
        (1, 5, 5, 256), (1, 3, 3, 256), (1, 1, 1, 256)]
    gt_bboxes = jnp.asarray([[[20, 20, 120, 120], [100, 40, 260, 200]]],
                            jnp.float32)
    shapes = jnp.asarray([[300, 300]], jnp.int32)
    losses = model.apply(
        variables, img, shapes, shapes, gt_bboxes,
        jnp.ones((1, 2), bool), jnp.asarray([[1, 3]], jnp.int32), None,
        method='forward_train', rngs={'sampling': jax.random.PRNGKey(2)})
    assert float(losses['loss_cls']) > 0
    assert float(losses['loss_bbox']) > 0
    out = model.apply(variables, img, shapes,
                      jnp.ones((1, 4), jnp.float32), method='simple_test')
    assert out['dets'].shape == (1, 16, 5)


def test_yolov3_forward():
    """Darknet-53 + YOLOV3Neck + YOLOV3Head (reference: yolo_head.py,
    darknet.py, yolo_neck.py)."""
    cfg = dict(
        type='YOLOV3',
        backbone=dict(type='Darknet', depth=53, out_indices=(3, 4, 5)),
        neck=dict(type='YOLOV3Neck', num_scales=3,
                  in_channels=[1024, 512, 256],
                  out_channels=[512, 256, 128]),
        bbox_head=dict(type='YOLOV3Head', num_classes=4,
                       in_channels=[512, 256, 128],
                       out_channels=[1024, 512, 256]),
        train_cfg=dict(assigner=dict(type='GridAssigner', pos_iou_thr=0.5,
                                     neg_iou_thr=0.5, min_pos_iou=0)),
        test_cfg=dict(nms_pre=100, min_bbox_size=0, score_thr=0.05,
                      conf_thr=0.005,
                      nms=dict(type='nms', iou_threshold=0.45),
                      max_per_img=16))
    model = build_detector(cfg)
    img = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        img, method='forward_dummy')
    feats = model.apply(variables, img, mutable=['batch_stats'])[0]
    # darknet docstring shapes scaled to 128: strides 8/16/32 reversed
    assert [tuple(f.shape) for f in feats] == [
        (1, 4, 4, 512), (1, 8, 8, 256), (1, 16, 16, 128)]
    gt_bboxes = jnp.asarray([[[10, 10, 60, 60], [50, 20, 120, 100]]],
                            jnp.float32)
    shapes = jnp.asarray([[128, 128]], jnp.int32)
    losses, _ = model.apply(
        variables, img, shapes, shapes, gt_bboxes,
        jnp.ones((1, 2), bool), jnp.asarray([[1, 3]], jnp.int32), None,
        method='forward_train', rngs={'sampling': jax.random.PRNGKey(2)},
        mutable=['batch_stats'])
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    assert float(losses['loss_conf']) > 0
    out = model.apply(variables, img, shapes,
                      jnp.ones((1, 4), jnp.float32), method='simple_test')
    assert out['dets'].shape == (1, 16, 5)


def test_free_anchor_forward():
    """FreeAnchor bag-MLE loss (reference: free_anchor_retina_head.py)."""
    cfg = tiny_retinanet_cfg()
    bh = cfg['bbox_head']
    bh['type'] = 'FreeAnchorRetinaHead'
    bh['pre_anchor_topk'] = 8
    bh['bbox_coder']['target_stds'] = [1.0, 1.0, 1.0, 1.0]
    model = build_detector(cfg)
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
    assert float(losses['positive_bag_loss']) > 0
    assert float(losses['negative_bag_loss']) > 0
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32), method='simple_test')
    assert out['dets'].shape == (2, 16, 5)


def test_vfnet_forward():
    """VFNet: star-DCN refinement + varifocal loss (reference:
    vfnet_head.py)."""
    cfg = dict(
        type='VFNet',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(1, 2, 3)),
        neck=dict(type='FPN', in_channels=[32, 64, 128], out_channels=16,
                  start_level=0, add_extra_convs='on_output', num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=dict(type='VFNetHead', num_classes=4, in_channels=16,
                       feat_channels=16, stacked_convs=1,
                       norm_cfg=dict(type='GN', num_groups=4),
                       strides=[8, 16, 32, 64, 128]),
        train_cfg=dict(assigner=dict(type='ATSSAssigner', topk=9),
                       allowed_border=-1, pos_weight=-1, debug=False),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=16))
    model = build_detector(cfg)
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
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    assert float(losses['loss_bbox_rf']) > 0
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32), method='simple_test')
    assert out['dets'].shape == (2, 16, 5)


def test_fsaf_forward():
    """FSAF: centre-region assignment + online feature selection
    (reference: fsaf_head.py)."""
    cfg = tiny_retinanet_cfg()
    cfg['type'] = 'FSAF'
    bh = cfg['bbox_head']
    bh['type'] = 'FSAFHead'
    bh['reg_decoded_bbox'] = True
    bh['anchor_generator'] = dict(
        type='AnchorGenerator', octave_base_scale=1,
        scales_per_octave=1, ratios=[1.0],
        strides=[8, 16, 32, 64, 128])
    bh['bbox_coder'] = dict(type='TBLRBBoxCoder', normalizer=4.0)
    bh['loss_bbox'] = dict(type='IoULoss', eps=1e-6, loss_weight=1.0)
    cfg['train_cfg'] = dict(
        assigner=dict(type='CenterRegionAssigner', pos_scale=0.2,
                      neg_scale=0.2, min_pos_iof=0.01),
        allowed_border=-1, pos_weight=-1)
    model = build_detector(cfg)
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
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    assert float(losses['loss_bbox']) > 0
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32), method='simple_test')
    assert out['dets'].shape == (2, 16, 5)


def test_nasfpn_shapes(rng):
    """NAS-FPN merging-cell topology (reference: nas_fpn.py +
    mmcv merge_cells)."""
    from swindet_tpu.models.necks import NASFPN
    ins = [jnp.asarray(rng.randn(1, 128 // s, 128 // s, c)
                       .astype(np.float32))
           for s, c in [(8, 64), (16, 128), (32, 256)]]
    neck = NASFPN(in_channels=[64, 128, 256], out_channels=16,
                  stack_times=2)
    v = neck.init(jax.random.PRNGKey(0), ins)
    outs, _ = neck.apply(v, ins, mutable=['batch_stats'])
    assert [tuple(o.shape) for o in outs] == [
        (1, 16, 16, 16), (1, 8, 8, 16), (1, 4, 4, 16),
        (1, 2, 2, 16), (1, 1, 1, 16)]


def tiny_fovea_cfg():
    return dict(
        type='FOVEA',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(1, 2, 3)),
        neck=dict(type='FPN', in_channels=[32, 64, 128], out_channels=16,
                  start_level=0, add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(
            type='FoveaHead', num_classes=4, in_channels=16,
            feat_channels=16, stacked_convs=1,
            strides=[8, 16, 32, 64, 128],
            base_edge_list=[16, 32, 64, 128, 256],
            scale_ranges=((1, 64), (32, 128), (64, 256), (128, 512),
                          (256, 2048)),
            sigma=0.4,
            loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=1.5,
                          alpha=0.4, loss_weight=1.0),
            loss_bbox=dict(type='SmoothL1Loss', beta=0.11,
                           loss_weight=1.0)),
        train_cfg=dict(),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=16))


def test_fovea_forward():
    model = build_detector(tiny_fovea_cfg())
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
    assert np.isfinite(float(losses['loss_cls']))
    assert np.isfinite(float(losses['loss_bbox']))
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)


def tiny_ld_cfg():
    gfl_like = dict(
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(1, 2, 3)),
        neck=dict(type='FPN', in_channels=[32, 64, 128], out_channels=16,
                  start_level=0, add_extra_convs='on_output', num_outs=5),
        train_cfg=dict(assigner=dict(type='ATSSAssigner', topk=9),
                       allowed_border=-1, pos_weight=-1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=16))
    head = dict(
        num_classes=4, in_channels=16, feat_channels=16,
        stacked_convs=1, reg_max=8,
        norm_cfg=dict(type='GN', num_groups=4),
        anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                              octave_base_scale=8, scales_per_octave=1,
                              strides=[8, 16, 32, 64, 128]),
        loss_cls=dict(type='QualityFocalLoss', use_sigmoid=True,
                      beta=2.0, loss_weight=1.0),
        loss_dfl=dict(type='DistributionFocalLoss', loss_weight=0.25),
        loss_bbox=dict(type='GIoULoss', loss_weight=2.0))
    teacher = dict(type='GFL', bbox_head=dict(type='GFLHead', **head),
                   **gfl_like)
    return dict(
        type='KnowledgeDistillationSingleStageDetector',
        teacher_config=teacher,
        bbox_head=dict(type='LDHead',
                       loss_ld=dict(
                           type='KnowledgeDistillationKLDivLoss',
                           loss_weight=0.25, T=10), **head),
        **gfl_like)


def test_ld_forward():
    model = build_detector(tiny_ld_cfg())
    batch = demo_inputs(b=2, h=64, w=64, with_mask=False)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'], method='forward_dummy')
    assert '_teacher' in variables['params']
    losses = model.apply(
        variables, batch['img'], batch['img_shapes'],
        batch['pad_shapes'], batch['gt_bboxes'], batch['gt_valid'],
        batch['gt_labels'], method='forward_train',
        rngs={'sampling': jax.random.PRNGKey(2)})
    for k in ('loss_cls', 'loss_bbox', 'loss_dfl', 'loss_ld'):
        assert np.isfinite(float(losses[k])), f'{k} not finite'
    assert float(losses['loss_ld']) >= 0
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)


def tiny_sabl_cfg():
    return dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(1, 2, 3)),
        neck=dict(type='FPN', in_channels=[32, 64, 128], out_channels=16,
                  start_level=0, add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(
            type='SABLRetinaHead', num_classes=4, in_channels=16,
            feat_channels=16, stacked_convs=1,
            approx_anchor_generator=dict(
                type='AnchorGenerator', octave_base_scale=4,
                scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                strides=[8, 16, 32, 64, 128]),
            square_anchor_generator=dict(
                type='AnchorGenerator', ratios=[1.0], scales=[4],
                strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='BucketingBBoxCoder', num_buckets=14,
                            scale_factor=3.0),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0),
            loss_bbox_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                               loss_weight=1.5),
            loss_bbox_reg=dict(type='SmoothL1Loss', beta=1.0 / 9.0,
                               loss_weight=1.5)),
        train_cfg=dict(
            assigner=dict(type='ApproxMaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.4, min_pos_iou=0.0,
                          ignore_iof_thr=-1),
            allowed_border=-1, pos_weight=-1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=16))


def test_sabl_forward():
    model = build_detector(tiny_sabl_cfg())
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
    for k in ('loss_cls', 'loss_bbox_cls', 'loss_bbox_reg'):
        assert np.isfinite(float(losses[k])), f'{k} not finite'
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)


def tiny_paa_cfg():
    return dict(
        type='PAA',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(1, 2, 3)),
        neck=dict(type='FPN', in_channels=[32, 64, 128], out_channels=16,
                  start_level=0, add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(
            type='PAAHead', reg_decoded_bbox=True, score_voting=True,
            topk=4, num_classes=4, in_channels=16, feat_channels=16,
            stacked_convs=1, norm_cfg=dict(type='GN', num_groups=4),
            anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                                  octave_base_scale=8,
                                  scales_per_octave=1,
                                  strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0., 0., 0., 0.],
                            target_stds=[0.1, 0.1, 0.2, 0.2]),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0),
            loss_bbox=dict(type='GIoULoss', loss_weight=1.3),
            loss_centerness=dict(type='CrossEntropyLoss',
                                 use_sigmoid=True, loss_weight=0.5)),
        train_cfg=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.1,
                          neg_iou_thr=0.1, min_pos_iou=0,
                          ignore_iof_thr=-1),
            allowed_border=-1, pos_weight=-1),
        test_cfg=dict(nms_pre=100, min_bbox_size=0, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=16))


def test_paa_forward():
    model = build_detector(tiny_paa_cfg())
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
    for k in ('loss_cls', 'loss_bbox', 'loss_iou'):
        assert np.isfinite(float(losses[k])), f'{k} not finite'
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)
    assert np.all(np.isfinite(np.asarray(out['dets'])))


def test_paa_gmm_separates_modes():
    """Two well-separated loss clusters: EM must put the low-loss
    cluster in component 0."""
    from swindet_tpu.models.dense_heads.paa_head import _gmm_em_1d
    x = jnp.asarray([0.1, 0.12, 0.15, 2.0, 2.1, 2.2, 0.0, 0.0])
    valid = jnp.asarray([True] * 6 + [False, False])
    resp0, loglik = _gmm_em_1d(x, valid)
    r = np.asarray(resp0)
    assert r[:3].all() and not r[3:6].any()
    assert np.isfinite(np.asarray(loglik)[:6]).all()


def test_carafe_reassembly_matches_manual():
    """CARAFE with a one-hot center kernel equals nearest upsample."""
    from swindet_tpu.ops.carafe import carafe
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(1, 4, 6, 3).astype(np.float32))
    k = jnp.zeros((1, 8, 12, 25)).at[..., 12].set(1.0)  # center tap
    out = carafe(x, k, 5, 2)
    ref = np.repeat(np.repeat(np.asarray(x), 2, 1), 2, 2)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_fpn_carafe_shapes():
    from swindet_tpu.models.builder import build_neck
    neck = build_neck(dict(
        type='FPN_CARAFE', in_channels=[16, 32, 64, 128],
        out_channels=16, num_outs=5,
        upsample_cfg=dict(type='carafe', up_kernel=5, up_group=1,
                          encoder_kernel=3, encoder_dilation=1)))
    ins = [jnp.zeros((1, 32 // (2 ** i), 48 // (2 ** i), c))
           for i, c in enumerate([16, 32, 64, 128])]
    v = neck.init(jax.random.PRNGKey(0), ins)
    outs = neck.apply(v, ins)
    assert len(outs) == 5
    assert outs[0].shape == (1, 32, 48, 16)
    assert outs[4].shape == (1, 2, 3, 16)


def test_pisa_retina_forward():
    cfg = tiny_retinanet_cfg()
    cfg['bbox_head']['type'] = 'PISARetinaHead'
    cfg['train_cfg']['isr'] = dict(k=2., bias=0.)
    cfg['train_cfg']['carl'] = dict(k=1., bias=0.2)
    model = build_detector(cfg)
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
    for k in ('loss_cls', 'loss_bbox', 'loss_carl'):
        assert np.isfinite(float(losses[k])), f'{k} not finite'


def tiny_nasfcos_cfg():
    return dict(
        type='NASFCOS',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(0, 1, 2, 3)),
        neck=dict(type='NASFCOS_FPN', in_channels=[16, 32, 64, 128],
                  out_channels=16, start_level=1, num_outs=5,
                  norm_cfg=dict(type='BN'),
                  conv_cfg=dict(type='DCNv2', deform_groups=2)),
        bbox_head=dict(
            type='NASFCOSHead', num_classes=4, in_channels=16,
            feat_channels=16, strides=[8, 16, 32, 64, 128],
            norm_cfg=dict(type='GN', num_groups=4),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                          gamma=2.0, alpha=0.25, loss_weight=1.0),
            loss_bbox=dict(type='IoULoss', loss_weight=1.0),
            loss_centerness=dict(type='CrossEntropyLoss',
                                 use_sigmoid=True, loss_weight=1.0)),
        train_cfg=dict(allowed_border=-1, pos_weight=-1),
        test_cfg=dict(nms_pre=100, min_bbox_size=0, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=16))


def test_nasfcos_forward():
    """Searched NASFCOS_FPN cells + DCNv2 tower head run end-to-end."""
    model = build_detector(tiny_nasfcos_cfg())
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
    total = sum(float(v) for v in losses.values())
    assert np.isfinite(total)
    out = model.apply(variables, batch['img'], batch['img_shapes'],
                      jnp.ones((2, 4), jnp.float32),
                      method='simple_test')
    assert out['dets'].shape == (2, 16, 5)
