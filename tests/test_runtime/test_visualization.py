"""GT-vs-det comparison panel (reference:
mmdet/core/visualization/image.py:189)."""
import numpy as np

from swindet_tpu.apis import imshow_gt_det_bboxes, show_result


def test_imshow_gt_det_bboxes(tmp_path):
    img = np.zeros((64, 64, 3), np.uint8)
    ann = dict(gt_bboxes=np.array([[5, 5, 30, 30]], np.float32),
               gt_labels=np.array([0]),
               gt_masks=np.zeros((1, 64, 64), np.float32))
    ann['gt_masks'][0, 8:20, 8:20] = 1
    res = [np.array([[6, 6, 31, 31, 0.9], [40, 40, 60, 60, 0.1]],
                    np.float32),
           np.zeros((0, 5), np.float32)]
    out_file = str(tmp_path / 'panel.png')
    out = imshow_gt_det_bboxes(img, ann, res, class_names=['a', 'b'],
                               score_thr=0.3, out_file=out_file)
    assert out.shape == (64, 64, 3)
    # GT box drawn (gt_color has red channel 255 in BGR at box border)
    assert out.sum() > 0
    import os
    assert os.path.exists(out_file)
    # low-score det suppressed: region around (40..60) stays black
    assert out[45:55, 45:55].sum() == 0


def test_show_result_masks():
    img = np.zeros((32, 32, 3), np.uint8)
    masks = [[np.zeros((32, 32), bool)]]
    masks[0][0][4:10, 4:10] = True
    res = ([np.array([[2, 2, 12, 12, 0.8]], np.float32)], masks)
    out = show_result(img, res, classes=['x'], score_thr=0.3)
    assert out[5:9, 5:9].sum() > 0
