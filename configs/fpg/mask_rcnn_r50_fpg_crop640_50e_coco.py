# (reference: configs/fpg/mask_rcnn_r50_fpg_crop640_50e_coco.py)
_base_ = './faster_rcnn_r50_fpg_crop640_50e_coco.py'
model = dict(
    type='MaskRCNN',
    roi_head=dict(
        type='StandardRoIHead',
        mask_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=14,
                           sampling_ratio=0),
            out_channels=256,
            featmap_strides=[4, 8, 16, 32]),
        mask_head=dict(
            type='FCNMaskHead',
            num_convs=4,
            in_channels=256,
            conv_out_channels=256,
            num_classes=80,
            loss_mask=dict(type='CrossEntropyLoss', use_mask=True,
                           loss_weight=1.0))),
    train_cfg=dict(rcnn=dict(mask_size=28)))
