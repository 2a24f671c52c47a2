"""v1→v2 checkpoint upgrade parity (reference:
tools/model_converters/upgrade_model_version.py): background channel
moves from first to last for softmax cls heads, per-class regression
and mask logits drop the background group, two-stage head keys gain
the roi_head. prefix."""
import numpy as np

from tools.model_converters.upgrade_model_version import (
    reorder_cls_channel, truncate_cls_channel, truncate_reg_channel,
    upgrade_state_dict)


def test_reorder_cls_channel():
    num_classes = 5
    b = np.arange(5, dtype=np.float32)
    np.testing.assert_array_equal(reorder_cls_channel(b, num_classes),
                                  [1, 2, 3, 4, 0])
    w = np.arange(5 * 3, dtype=np.float32).reshape(5, 3)
    out = reorder_cls_channel(w, num_classes)
    np.testing.assert_array_equal(out, np.concatenate([w[1:], w[:1]]))
    # anchor-grouped conv_cls: out = A*num_classes
    w = np.arange(2 * 5 * 3, dtype=np.float32).reshape(10, 3)
    out = reorder_cls_channel(w, num_classes)
    v = w.reshape(2, 5, 3)
    np.testing.assert_array_equal(
        out, np.concatenate([v[:, 1:], v[:, :1]], 1).reshape(10, 3))
    # agnostic passthrough
    w = np.ones((7, 3), np.float32)
    assert reorder_cls_channel(w, num_classes) is w


def test_truncate_reg_channel():
    num_classes = 3
    b = np.arange(12, dtype=np.float32)  # 3 classes x 4
    # reference keeps the FIRST num_classes-1 groups (bg is last after
    # the cls reorder)
    np.testing.assert_array_equal(truncate_reg_channel(b, num_classes),
                                  np.arange(8))
    w = np.arange(12 * 2, dtype=np.float32).reshape(12, 2)
    out = truncate_reg_channel(w, num_classes)
    np.testing.assert_array_equal(out, w.reshape(3, 4, 2)[:2]
                                  .reshape(8, 2))


def test_truncate_cls_channel_mask():
    num_classes = 3
    w = np.arange(3 * 2, dtype=np.float32).reshape(3, 2)
    out = truncate_cls_channel(w, num_classes)
    np.testing.assert_array_equal(out, w[1:])


def test_upgrade_state_dict_keys():
    sd = {
        'backbone.conv1.weight': np.ones((4, 3, 3, 3), np.float32),
        'bbox_head.fc_cls.bias': np.arange(3, dtype=np.float32),
        'bbox_head.fc_reg.bias': np.arange(12, dtype=np.float32),
        'mask_head.conv_logits.weight':
            np.arange(6, dtype=np.float32).reshape(3, 2),
    }
    out = upgrade_state_dict(sd, num_classes=3, two_stage=True,
                             verbose=False)
    assert 'backbone.conv1.weight' in out
    assert 'roi_head.bbox_head.fc_cls.bias' in out
    np.testing.assert_array_equal(
        out['roi_head.bbox_head.fc_cls.bias'], [1, 2, 0])
    np.testing.assert_array_equal(
        out['roi_head.bbox_head.fc_reg.bias'], np.arange(8))
    assert out['roi_head.mask_head.conv_logits.weight'].shape == (2, 2)
