import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from .roi_align import roi_align, RoIAlign, _pair
from .nms import nms, batched_nms, nms_match, soft_nms
from .deform_conv import DeformConv2d, MaskedConv2d, deform_conv2d
from .carafe import CARAFEPack


def sigmoid_focal_loss(pred, target, gamma=2.0, alpha=0.25, weight=None,
                       reduction='mean'):
    """Reference pure-py semantics: target is the class index (long),
    one-hot inside; matches mmcv CUDA op."""
    num_classes = pred.shape[1]
    t = F.one_hot(target, num_classes + 1)[:, :num_classes].to(pred)
    p = pred.sigmoid()
    pt = (1 - p) * t + p * (1 - t)
    focal_weight = (alpha * t + (1 - alpha) * (1 - t)) * pt.pow(gamma)
    loss = F.binary_cross_entropy_with_logits(
        pred, t, reduction='none') * focal_weight
    if weight is not None:
        loss = loss * weight
    if reduction == 'mean':
        return loss.mean()
    if reduction == 'sum':
        return loss.sum()
    return loss


class RoIPool(nn.Module):
    def __init__(self, output_size, spatial_scale=1.0):
        super().__init__()
        self.output_size = _pair(output_size)
        self.spatial_scale = spatial_scale

    def forward(self, input, rois):
        raise NotImplementedError('RoIPool shim is import-only')


class CornerPool(nn.Module):
    """Directional cummax pooling (CornerNet)."""

    def __init__(self, mode):
        super().__init__()
        assert mode in ('top', 'bottom', 'left', 'right')
        self.mode = mode

    def forward(self, x):
        if self.mode == 'top':
            return x.flip(2).cummax(dim=2).values.flip(2)
        if self.mode == 'bottom':
            return x.cummax(dim=2).values
        if self.mode == 'left':
            return x.flip(3).cummax(dim=3).values.flip(3)
        return x.cummax(dim=3).values


def point_sample(input, points, align_corners=False):
    """grid_sample at normalized [0,1] point coords (mmcv semantics)."""
    add_dim = False
    if points.dim() == 3:
        add_dim = True
        points = points.unsqueeze(2)
    output = F.grid_sample(input, 2.0 * points - 1.0,
                           align_corners=align_corners)
    if add_dim:
        output = output.squeeze(3)
    return output


def rel_roi_point_to_rel_img_point(rois, rel_roi_points, img_shape,
                                   spatial_scale=1.0):
    if rois.size(1) == 5:
        rois = rois[:, 1:]
    abs_x = rois[:, None, 0] + rel_roi_points[..., 0] * (
        rois[:, None, 2] - rois[:, None, 0])
    abs_y = rois[:, None, 1] + rel_roi_points[..., 1] * (
        rois[:, None, 3] - rois[:, None, 1])
    if isinstance(img_shape, torch.Tensor):
        h, w = img_shape[0], img_shape[1]
    else:
        h, w = img_shape[:2]
    return torch.stack([abs_x / w, abs_y / h], dim=2) * spatial_scale
