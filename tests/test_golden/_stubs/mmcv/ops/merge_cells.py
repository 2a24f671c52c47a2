"""NAS-FPN merge cells (sum / global-pool-attention / concat)."""
import torch
import torch.nn as nn
import torch.nn.functional as F


class BaseMergeCell(nn.Module):
    def __init__(self, fused_channels=256, out_channels=256,
                 with_out_conv=True, out_conv_cfg=None,
                 out_norm_cfg=None, out_conv_order=('act', 'conv', 'norm'),
                 with_input1_conv=False, with_input2_conv=False,
                 input_conv_cfg=None, input_norm_cfg=None,
                 upsample_mode='nearest'):
        super().__init__()
        from ..cnn import ConvModule
        self.with_out_conv = with_out_conv
        self.upsample_mode = upsample_mode
        if with_out_conv:
            self.out_conv = ConvModule(fused_channels, out_channels, 3,
                                       padding=1, norm_cfg=out_norm_cfg,
                                       order=out_conv_order)
        self.input1_conv = (ConvModule(fused_channels, out_channels, 1,
                                       norm_cfg=input_norm_cfg)
                            if with_input1_conv else nn.Identity())
        self.input2_conv = (ConvModule(fused_channels, out_channels, 1,
                                       norm_cfg=input_norm_cfg)
                            if with_input2_conv else nn.Identity())

    def _resize(self, x, size):
        if x.shape[-2:] == tuple(size):
            return x
        if x.shape[-2] < size[0]:
            return F.interpolate(x, size=size, mode=self.upsample_mode)
        kh = x.shape[-2] // size[0]
        kw = x.shape[-1] // size[1]
        return F.max_pool2d(x, kernel_size=(kh, kw), stride=(kh, kw))

    def _binary_op(self, x1, x2):
        raise NotImplementedError

    def forward(self, x1, x2, out_size=None):
        if out_size is None:
            out_size = max(x1.shape[-2:], x2.shape[-2:])
        x1 = self.input1_conv(x1)
        x2 = self.input2_conv(x2)
        x1 = self._resize(x1, out_size)
        x2 = self._resize(x2, out_size)
        out = self._binary_op(x1, x2)
        if self.with_out_conv:
            out = self.out_conv(out)
        return out


class SumCell(BaseMergeCell):
    def __init__(self, in_channels, out_channels, **kwargs):
        super().__init__(in_channels, out_channels, **kwargs)

    def _binary_op(self, x1, x2):
        return x1 + x2


class GlobalPoolingCell(BaseMergeCell):
    def __init__(self, in_channels=None, out_channels=None, **kwargs):
        super().__init__(in_channels, out_channels, **kwargs)
        self.global_pool = nn.AdaptiveAvgPool2d((1, 1))

    def _binary_op(self, x1, x2):
        x2_att = self.global_pool(x2).sigmoid()
        return x2 + x2_att * x1


class ConcatCell(BaseMergeCell):
    def __init__(self, in_channels, out_channels, **kwargs):
        super().__init__(in_channels * 2, out_channels, **kwargs)

    def _binary_op(self, x1, x2):
        return torch.cat([x1, x2], dim=1)
