# DetectoRS SAC-only Cascade R-CNN (reference: configs/detectors/
# cascade_rcnn_r50_sac_1x_coco.py)
_base_ = '../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py'
model = dict(
    backbone=dict(
        _delete_=True,
        type='DetectoRS_ResNet',
        depth=50,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        sac=dict(type='SAC', use_deform=False),
        stage_with_sac=(False, True, True, True)))
