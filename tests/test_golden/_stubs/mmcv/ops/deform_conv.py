"""Pure-torch DeformConv2d (Dai et al. 2017) with mmcv layout semantics.

Offset tensor layout: (B, 2 * deform_groups * Kh * Kw, Ho, Wo); for tap
k (row-major over the kernel) channel 2k is the y-offset and 2k+1 the
x-offset. Bilinear sampling contributes zero outside (-1, size) and
clamps inside, identical to the RoIAlign rule.
"""
import torch
import torch.nn as nn

from .roi_align import _bilinear, _pair


def deform_conv2d(x, offset, weight, stride=1, padding=0, dilation=1,
                  groups=1, deform_groups=1):
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    b, cin, h, w = x.shape
    cout, cin_g, kh, kw = weight.shape
    ho = (h + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    wo = (w + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    k = kh * kw
    assert offset.shape[1] == 2 * deform_groups * k
    base_y = torch.arange(ho, dtype=x.dtype) * sh - ph
    base_x = torch.arange(wo, dtype=x.dtype) * sw - pw
    cols = []  # per tap, (B, Cin, Ho*Wo)
    cpg = cin // deform_groups  # input channels per deform group
    for ki in range(kh):
        for kj in range(kw):
            tap = ki * kw + kj
            samp_groups = []
            for g in range(deform_groups):
                oy = offset[:, 2 * (g * k + tap)]
                ox = offset[:, 2 * (g * k + tap) + 1]
                ys = base_y[None, :, None] + ki * dh + oy
                xs = base_x[None, None, :] + kj * dw + ox
                per_b = []
                for bi in range(b):
                    feat = x[bi, g * cpg:(g + 1) * cpg]
                    per_b.append(_bilinear(feat, ys[bi].reshape(-1),
                                           xs[bi].reshape(-1)))
                samp_groups.append(torch.stack(per_b))  # (B,cpg,Ho*Wo)
            cols.append(torch.cat(samp_groups, dim=1))
    col = torch.stack(cols, dim=2)  # (B, Cin, K, Ho*Wo)
    assert groups == 1, 'shim supports groups=1'
    out = torch.einsum('bckn,ock->bon', col,
                       weight.reshape(cout, cin_g, k))
    return out.reshape(b, cout, ho, wo)


class DeformConv2d(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, deform_groups=1,
                 bias=False):
        super().__init__()
        assert not bias
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.deform_groups = deform_groups
        self.weight = nn.Parameter(
            torch.empty(out_channels, in_channels // groups,
                        *self.kernel_size))
        nn.init.kaiming_uniform_(self.weight, a=5 ** 0.5)

    def forward(self, x, offset):
        return deform_conv2d(x, offset, self.weight, self.stride,
                             self.padding, self.dilation, self.groups,
                             self.deform_groups)


class MaskedConv2d(nn.Conv2d):
    """conv whose output is only computed where mask is set; the dense
    conv + mask multiply is numerically identical."""

    def forward(self, x, mask=None):
        out = super().forward(x)
        if mask is not None:
            out = out * (mask > 0).to(out)[:, None]
        return out
