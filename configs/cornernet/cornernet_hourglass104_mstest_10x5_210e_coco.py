# (reference: configs/cornernet/cornernet_hourglass104_mstest_10x5_210e_coco.py)
_base_ = './cornernet_hourglass104_mstest_8x6_210e_coco.py'
# 10 GPU x 5 img layout of the same recipe
data = dict(samples_per_gpu=5, workers_per_gpu=3)
