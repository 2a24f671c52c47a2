# (reference: configs/gcnet/mask_rcnn_r50_fpn_syncbn-backbone_1x_coco.py)
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
# SyncBN backbone: norm sync is the engine's pmean policy here
