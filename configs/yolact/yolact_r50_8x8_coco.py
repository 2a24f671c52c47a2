# (reference: configs/yolact/yolact_r50_8x8_coco.py)
_base_ = './yolact_r50_1x8_coco.py'
# 8-GPU layout of the same recipe (lr x8 with warmup in the reference)
optimizer = dict(type='SGD', lr=8e-3, momentum=0.9, weight_decay=5e-4)
lr_config = dict(warmup='linear', warmup_iters=1000, warmup_ratio=0.1,
                 step=[20, 42, 49, 52])
