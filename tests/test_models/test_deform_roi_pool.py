"""Deformable RoI pooling (dpool/mdpool): op semantics vs RoIAlign and
end-to-end Faster R-CNN with a ModulatedDeformRoIPoolPack extractor
(reference: configs/dcn/faster_rcnn_r50_fpn_{dpool,mdpool}_1x_coco.py;
op: mmcv deform_roi_pool)."""
import numpy as np
import jax
import jax.numpy as jnp

from swindet_tpu.models import build_detector
from swindet_tpu.models.roi_heads.roi_extractor import (
    DeformRoIExtractor, SingleRoIExtractor)
from swindet_tpu.ops.deform_roi_pool import multilevel_deform_roi_pool
from swindet_tpu.ops.roi_align import multilevel_roi_align

from tests.test_models.test_fast_groie import _rcnn_cfgs
from tests.test_models.test_forward import demo_inputs


def _feats_rois():
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(2, 32 // s, 48 // s, 8), jnp.float32)
             for s in (1, 2, 4, 8)]
    rois = jnp.asarray([
        [0, 4.0, 6.0, 60.0, 50.0],
        [1, 10.0, 2.0, 100.0, 90.0],
        [0, 30.0, 20.0, 170.0, 110.0],
    ], jnp.float32)
    return feats, rois


def test_zero_offset_equals_roi_align():
    feats, rois = _feats_rois()
    off = jnp.zeros((3, 7, 7, 2), jnp.float32)
    d = multilevel_deform_roi_pool(feats, rois, off, (4, 8, 16, 32), 7)
    a = multilevel_roi_align(feats, rois, (4, 8, 16, 32), 7)
    np.testing.assert_allclose(np.asarray(d), np.asarray(a),
                               rtol=1e-5, atol=1e-5)


def test_constant_offset_equals_shifted_roi():
    """A uniform offset over all bins translates the whole sampling
    window: equivalent to pooling (offset=0) on a translated RoI."""
    feats, rois = _feats_rois()
    gamma, dx, dy = 0.1, 0.5, -0.3
    off = jnp.tile(jnp.asarray([dx, dy], jnp.float32), (3, 7, 7, 1))
    d = multilevel_deform_roi_pool(feats, rois, off, (4, 8, 16, 32), 7,
                                   gamma=gamma)
    # translate each roi by gamma*extent*offset in IMAGE units (extent
    # in feature units × stride == image units since scale is linear)
    w = rois[:, 3] - rois[:, 1]
    h = rois[:, 4] - rois[:, 2]
    shifted = rois + jnp.stack(
        [jnp.zeros_like(w), gamma * dx * w, gamma * dy * h,
         gamma * dx * w, gamma * dy * h], axis=-1)
    # same level routing (area unchanged); offset=0 pool on shifted rois
    zero = jnp.zeros((3, 7, 7, 2), jnp.float32)
    ref = multilevel_deform_roi_pool(feats, shifted, zero, (4, 8, 16, 32),
                                     7, gamma=gamma)
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_extractor_dispatch_and_zero_init():
    """SingleRoIExtractor with a deform roi_layer returns the flax
    module; zero-init output layers make the first forward equal plain
    RoIAlign (mask branch = sigmoid(0) = 0.5 for the modulated pack)."""
    ext = SingleRoIExtractor(
        roi_layer=dict(type='DeformRoIPoolPack', output_size=7,
                       output_channels=8),
        out_channels=8, featmap_strides=[4, 8, 16, 32])
    assert isinstance(ext, DeformRoIExtractor)
    feats, rois = _feats_rois()
    variables = ext.init(jax.random.PRNGKey(0), feats, rois)
    out = ext.apply(variables, feats, rois)
    a = multilevel_roi_align(feats, rois, (4, 8, 16, 32), 7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(a),
                               rtol=1e-5, atol=1e-5)

    mext = SingleRoIExtractor(
        roi_layer=dict(type='ModulatedDeformRoIPoolPack', output_size=7,
                       output_channels=8),
        out_channels=8, featmap_strides=[4, 8, 16, 32])
    mvars = mext.init(jax.random.PRNGKey(0), feats, rois)
    mout = mext.apply(mvars, feats, rois)
    np.testing.assert_allclose(np.asarray(mout), 0.5 * np.asarray(a),
                               rtol=1e-5, atol=1e-5)


def _tiny_mdpool_cfg():
    train_cfg, test_cfg = _rcnn_cfgs()
    train_cfg['rpn'] = dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                      neg_iou_thr=0.3, min_pos_iou=0.3,
                      ignore_iof_thr=-1),
        sampler=dict(type='RandomSampler', num=32, pos_fraction=0.5,
                     neg_pos_ub=-1, add_gt_as_proposals=False),
        allowed_border=-1, pos_weight=-1)
    train_cfg['rpn_proposal'] = dict(
        nms_pre=64, max_per_img=32,
        nms=dict(type='nms', iou_threshold=0.7), min_bbox_size=0)
    test_cfg['rpn'] = dict(nms_pre=64, max_per_img=32,
                           nms=dict(type='nms', iou_threshold=0.7),
                           min_bbox_size=0)
    return dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=(0, 1, 2, 3)),
        neck=dict(type='FPN', in_channels=[16, 32, 64, 128],
                  out_channels=16, num_outs=5),
        rpn_head=dict(
            type='RPNHead', in_channels=16, feat_channels=16,
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
                roi_layer=dict(type='ModulatedDeformRoIPoolPack',
                               output_size=7, output_channels=16,
                               deform_fc_channels=32),
                out_channels=16, featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(
                type='Shared2FCBBoxHead', in_channels=16,
                fc_out_channels=32, roi_feat_size=7, num_classes=4,
                bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                target_means=[0., 0., 0., 0.],
                                target_stds=[0.1, 0.1, 0.2, 0.2]),
                loss_cls=dict(type='CrossEntropyLoss'),
                loss_bbox=dict(type='L1Loss', loss_weight=1.0))),
        train_cfg=train_cfg, test_cfg=test_cfg)


def test_mdpool_faster_rcnn_forward():
    model = build_detector(_tiny_mdpool_cfg())
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


def test_dpool_converter_key_translation():
    """mmcv DeformRoIPoolPack checkpoints (per-level roi_layers.{l}.
    offset_fc/mask_fc Sequentials) convert onto the per-level flax
    packs: keys consumed, Linear weights land transposed, NCHW flatten
    means fc1 rows line up with torch with no reorder hint."""
    from swindet_tpu.checkpoint import convert_torch_state_dict

    model = build_detector(_tiny_mdpool_cfg())
    batch = demo_inputs(b=1, h=64, w=64, with_mask=False)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampling': jax.random.PRNGKey(1)},
        batch['img'], method='forward_dummy')
    params = variables['params']

    rs = np.random.RandomState(0)
    in_dim, fcc, out2, out1 = 16 * 7 * 7, 32, 7 * 7 * 2, 7 * 7
    sd = {}
    for l in range(4):
        pre = f'roi_head.bbox_roi_extractor.roi_layers.{l}'
        sd[f'{pre}.offset_fc.0.weight'] = rs.randn(fcc, in_dim) \
            .astype(np.float32)
        sd[f'{pre}.offset_fc.0.bias'] = rs.randn(fcc).astype(np.float32)
        sd[f'{pre}.offset_fc.2.weight'] = rs.randn(fcc, fcc) \
            .astype(np.float32)
        sd[f'{pre}.offset_fc.2.bias'] = rs.randn(fcc).astype(np.float32)
        sd[f'{pre}.offset_fc.4.weight'] = rs.randn(out2, fcc) \
            .astype(np.float32)
        sd[f'{pre}.offset_fc.4.bias'] = rs.randn(out2).astype(np.float32)
        sd[f'{pre}.mask_fc.0.weight'] = rs.randn(fcc, in_dim) \
            .astype(np.float32)
        sd[f'{pre}.mask_fc.0.bias'] = rs.randn(fcc).astype(np.float32)
        sd[f'{pre}.mask_fc.2.weight'] = rs.randn(out1, fcc) \
            .astype(np.float32)
        sd[f'{pre}.mask_fc.2.bias'] = rs.randn(out1).astype(np.float32)

    new_params, report = convert_torch_state_dict(sd, params)
    ext = new_params['_roi_head']['_bbox_extractor']
    for l in range(4):
        pre = f'roi_head.bbox_roi_extractor.roi_layers.{l}'
        np.testing.assert_allclose(
            np.asarray(ext[f'roi_layers{l}_offset_fc1']['kernel']),
            sd[f'{pre}.offset_fc.0.weight'].T, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ext[f'roi_layers{l}_offset_out']['bias']),
            sd[f'{pre}.offset_fc.4.bias'], rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ext[f'roi_layers{l}_mask_out']['kernel']),
            sd[f'{pre}.mask_fc.2.weight'].T, rtol=1e-6)
    # every dpool leaf was matched (none left at init / reported missing)
    assert not [k for k in report['missing'] if 'roi_layers' in k]
