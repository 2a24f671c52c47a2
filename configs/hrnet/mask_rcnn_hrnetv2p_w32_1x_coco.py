# (reference: configs/hrnet/mask_rcnn_hrnetv2p_w32_1x_coco.py)
_base_ = './mask_rcnn_hrnetv2p_w18_1x_coco.py'
model = dict(
    backbone=dict(
        extra=dict(
            stage2=dict(num_channels=(32, 64)),
            stage3=dict(num_channels=(32, 64, 128)),
            stage4=dict(num_channels=(32, 64, 128, 256)))),
    neck=dict(type='HRFPN', in_channels=[32, 64, 128, 256], out_channels=256))
