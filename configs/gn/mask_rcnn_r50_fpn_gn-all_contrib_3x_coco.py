# (reference: configs/gn/mask_rcnn_r50_fpn_gn-all_contrib_3x_coco.py)
_base_ = './mask_rcnn_r50_fpn_gn-all_3x_coco.py'
