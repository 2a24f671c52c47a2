# r101 variant of dynamic_rcnn (reference family: configs/dynamic_rcnn)
_base_ = './dynamic_rcnn_r50_fpn_1x.py'
model = dict(backbone=dict(depth=101))
