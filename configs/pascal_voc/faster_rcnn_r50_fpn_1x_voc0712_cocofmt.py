# (reference: configs/pascal_voc/faster_rcnn_r50_fpn_1x_voc0712_cocofmt.py)
_base_ = './faster_rcnn_r50_fpn_1x_voc0712.py'
# VOC converted to COCO json (tools/dataset_converters/pascal_voc.py)
dataset_type = 'CocoDataset'
data_root = 'data/VOCdevkit/'
data = dict(
    train=dict(
        _delete_=True,
        type=dataset_type,
        ann_file=data_root + 'annotations/voc0712_trainval.json',
        img_prefix=data_root,
        classes=('aeroplane', 'bicycle', 'bird', 'boat', 'bottle',
                 'bus', 'car', 'cat', 'chair', 'cow', 'diningtable',
                 'dog', 'horse', 'motorbike', 'person', 'pottedplant',
                 'sheep', 'sofa', 'train', 'tvmonitor'),
        pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='LoadAnnotations', with_bbox=True),
            dict(type='Resize', img_scale=(1000, 600), keep_ratio=True),
            dict(type='RandomFlip', flip_ratio=0.5),
            dict(type='Normalize',
                 mean=[123.675, 116.28, 103.53],
                 std=[58.395, 57.12, 57.375], to_rgb=True),
            dict(type='Pad', size_divisor=32),
            dict(type='DefaultFormatBundle'),
            dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
        ]))
evaluation = dict(interval=1, metric='bbox')
