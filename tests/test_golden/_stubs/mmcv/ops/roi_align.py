"""Pure-torch RoIAlign with mmcv/detectron2 semantics.

Spec implemented (matches mmcv.ops.RoIAlign docs and the CUDA kernel's
published behaviour):
- ``aligned=True``: continuous coordinate ``c`` maps to pixel center
  ``c - 0.5`` (half-pixel offset); no size clamping.
- ``aligned=False`` (legacy): no offset, roi extent clamped to >= 1.
- ``sampling_ratio > 0``: that many sample points per bin per axis.
- ``sampling_ratio <= 0``: adaptive ``ceil(roi_extent / out_size)``.
- bilinear interpolation: points with y <= -1 or y >= H (or x likewise)
  contribute 0; otherwise coordinates are clamped into [0, size-1].
- ``pool_mode='avg'`` averages the sample points per bin.

Slow (python loop over RoIs) but exact; golden tests use tiny inputs.
"""
import math

import torch
import torch.nn as nn


def _pair(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


def _bilinear(feat, ys, xs):
    """feat (C,H,W); ys/xs 1-D float tensors → (C, len) samples."""
    C, H, W = feat.shape
    valid = (ys > -1.0) & (ys < H) & (xs > -1.0) & (xs < W)
    y = ys.clamp(min=0.0)
    x = xs.clamp(min=0.0)
    y0 = y.floor().long().clamp(max=H - 1)
    x0 = x.floor().long().clamp(max=W - 1)
    y1 = (y0 + 1).clamp(max=H - 1)
    x1 = (x0 + 1).clamp(max=W - 1)
    # when y0 == H-1 the CUDA kernel sets y = y0 (weight on low cell)
    ly = (y - y0.to(y)).clamp(0, 1)
    lx = (x - x0.to(x)).clamp(0, 1)
    hy, hx = 1.0 - ly, 1.0 - lx
    v00 = feat[:, y0, x0]
    v01 = feat[:, y0, x1]
    v10 = feat[:, y1, x0]
    v11 = feat[:, y1, x1]
    out = (v00 * (hy * hx) + v01 * (hy * lx) + v10 * (ly * hx)
           + v11 * (ly * lx))
    return out * valid.to(out)


def roi_align(input, rois, output_size, spatial_scale=1.0,
              sampling_ratio=0, pool_mode='avg', aligned=True):
    assert pool_mode == 'avg', 'only avg pool implemented in shim'
    # mmcv's CUDA backward produces NO roi-coordinate gradient (input
    # grads only); autograd through this pure-torch bilinear sampling
    # would invent one (visible via Sparse R-CNN's learnable init
    # proposals), so detach to match the real op's semantics
    rois = rois.detach()
    out_h, out_w = _pair(output_size)
    n = rois.shape[0]
    chans = input.shape[1]
    out = input.new_zeros(n, chans, out_h, out_w)
    offset = 0.5 if aligned else 0.0
    for i in range(n):
        batch = int(rois[i, 0].item())
        x1 = rois[i, 1].item() * spatial_scale - offset
        y1 = rois[i, 2].item() * spatial_scale - offset
        x2 = rois[i, 3].item() * spatial_scale - offset
        y2 = rois[i, 4].item() * spatial_scale - offset
        roi_w = x2 - x1
        roi_h = y2 - y1
        if not aligned:
            roi_w = max(roi_w, 1.0)
            roi_h = max(roi_h, 1.0)
        bin_w = roi_w / out_w
        bin_h = roi_h / out_h
        gw = sampling_ratio if sampling_ratio > 0 else int(
            math.ceil(roi_w / out_w))
        gh = sampling_ratio if sampling_ratio > 0 else int(
            math.ceil(roi_h / out_h))
        gw = max(gw, 1)
        gh = max(gh, 1)
        # sample grid: for bin (ph,pw), point (iy,ix):
        #   y = y1 + ph*bin_h + (iy+0.5)*bin_h/gh
        ph = torch.arange(out_h, dtype=torch.float64)
        pw = torch.arange(out_w, dtype=torch.float64)
        iy = (torch.arange(gh, dtype=torch.float64) + 0.5) / gh
        ix = (torch.arange(gw, dtype=torch.float64) + 0.5) / gw
        ys = (y1 + (ph[:, None] + iy[None, :]) * bin_h).reshape(-1)
        xs = (x1 + (pw[:, None] + ix[None, :]) * bin_w).reshape(-1)
        yy = ys[:, None].expand(out_h * gh, out_w * gw).reshape(-1)
        xx = xs[None, :].expand(out_h * gh, out_w * gw).reshape(-1)
        samp = _bilinear(input[batch].to(torch.float64), yy, xx)
        samp = samp.reshape(chans, out_h, gh, out_w, gw)
        out[i] = samp.mean(dim=(2, 4)).to(out.dtype)
    return out


class RoIAlign(nn.Module):
    def __init__(self, output_size, spatial_scale=1.0, sampling_ratio=0,
                 pool_mode='avg', aligned=True, use_torchvision=False):
        super().__init__()
        self.output_size = _pair(output_size)
        self.spatial_scale = spatial_scale
        self.sampling_ratio = sampling_ratio
        self.pool_mode = pool_mode
        self.aligned = aligned

    def forward(self, input, rois):
        return roi_align(input, rois, self.output_size,
                         self.spatial_scale, self.sampling_ratio,
                         self.pool_mode, self.aligned)

    def __repr__(self):
        return (f'RoIAlign(out={self.output_size}, '
                f'scale={self.spatial_scale}, sr={self.sampling_ratio}, '
                f'aligned={self.aligned})')
