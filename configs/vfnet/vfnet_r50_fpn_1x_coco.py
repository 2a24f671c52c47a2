# VarifocalNet (reference: configs/vfnet/vfnet_r50_fpn_1x_coco.py)
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='VFNet',
    pretrained=None,
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_eval=True),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=1,
              add_extra_convs='on_output', num_outs=5,
              relu_before_extra_convs=True),
    bbox_head=dict(
        type='VFNetHead', num_classes=80, in_channels=256,
        stacked_convs=3, feat_channels=256,
        strides=[8, 16, 32, 64, 128],
        center_sampling=False, dcn_on_last_conv=False,
        use_atss=True,
        anchor_generator=dict(
            type='AnchorGenerator',
            ratios=[1.0],
            octave_base_scale=8,
            scales_per_octave=1,
            center_offset=0.0,
            strides=[8, 16, 32, 64, 128]),
        use_vfl=True,
        loss_cls=dict(type='VarifocalLoss', use_sigmoid=True,
                      alpha=0.75, gamma=2.0, iou_weighted=True,
                      loss_weight=1.0),
        loss_bbox=dict(type='GIoULoss', loss_weight=1.5),
        loss_bbox_refine=dict(type='GIoULoss', loss_weight=2.0)),
    train_cfg=dict(assigner=dict(type='ATSSAssigner', topk=9),
                   allowed_border=-1, pos_weight=-1, debug=False),
    test_cfg=dict(nms_pre=1000, min_bbox_size=0, score_thr=0.05,
                  nms=dict(type='nms', iou_threshold=0.6),
                  max_per_img=100))
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001)
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.1, step=[8, 11])
