# Grid R-CNN (reference: configs/grid_rcnn/
# grid_rcnn_r50_fpn_gn-head_2x_coco.py)
_base_ = [
    '../_base_/models/faster_rcnn_r50_fpn.py',
    '../_base_/datasets/coco_detection.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='GridRCNN',
    roi_head=dict(
        type='GridRoIHead',
        bbox_head=dict(with_reg=False),
        grid_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=14,
                           sampling_ratio=0),
            out_channels=256,
            featmap_strides=[4, 8, 16, 32]),
        grid_head=dict(
            type='GridHead',
            grid_points=9,
            num_convs=8,
            in_channels=256,
            point_feat_channels=64,
            norm_cfg=dict(type='GN', num_groups=36),
            loss_grid=dict(
                type='CrossEntropyLoss', use_sigmoid=True,
                loss_weight=15))),
    train_cfg=dict(
        rcnn=dict(
            assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                          min_pos_iou=0.5),
            sampler=dict(num=256),
            pos_radius=1,
            max_num_grid=192)),
    test_cfg=dict(
        rcnn=dict(score_thr=0.03,
                  nms=dict(type='nms', iou_threshold=0.3),
                  max_per_img=100)))
optimizer = dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=None)
lr_config = dict(
    policy='step',
    warmup='linear',
    warmup_iters=3665,
    warmup_ratio=1.0 / 80,
    step=[17, 23])
runner = dict(type='EpochBasedRunner', max_epochs=25)
