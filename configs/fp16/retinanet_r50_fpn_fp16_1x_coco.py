_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
# reference fp16 loss-scale training; on TPU the runner uses bf16
# compute (no loss scaling needed — bf16 has fp32 exponent range)
fp16 = dict(loss_scale=512.)
