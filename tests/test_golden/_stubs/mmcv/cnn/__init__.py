"""mmcv.cnn shim: ConvModule + layer builders + init helpers, pure torch."""
import math
import warnings

import numpy as np
import torch
import torch.nn as nn

Linear = nn.Linear
Conv2d = nn.Conv2d
MaxPool2d = nn.MaxPool2d

CONV_LAYERS = {'Conv2d': nn.Conv2d, 'Conv': nn.Conv2d,
               'Conv1d': nn.Conv1d, 'Conv3d': nn.Conv3d}
NORM_LAYERS = {'BN': nn.BatchNorm2d, 'BN1d': nn.BatchNorm1d,
               'BN2d': nn.BatchNorm2d, 'BN3d': nn.BatchNorm3d,
               'SyncBN': nn.BatchNorm2d, 'GN': nn.GroupNorm,
               'LN': nn.LayerNorm, 'IN': nn.InstanceNorm2d}
_NORM_ABBR = {'BN': 'bn', 'BN1d': 'bn', 'BN2d': 'bn', 'BN3d': 'bn',
              'SyncBN': 'bn', 'GN': 'gn', 'LN': 'ln', 'IN': 'in'}
ACT_LAYERS = {'ReLU': nn.ReLU, 'LeakyReLU': nn.LeakyReLU,
              'PReLU': nn.PReLU, 'RReLU': nn.RReLU, 'ReLU6': nn.ReLU6,
              'ELU': nn.ELU, 'Sigmoid': nn.Sigmoid, 'Tanh': nn.Tanh,
              'GELU': nn.GELU}


def build_conv_layer(cfg, *args, **kwargs):
    if cfg is None:
        return nn.Conv2d(*args, **kwargs)
    cfg_ = dict(cfg)
    layer_type = cfg_.pop('type')
    if layer_type not in CONV_LAYERS:
        raise KeyError(f'conv layer {layer_type} unsupported in shim')
    return CONV_LAYERS[layer_type](*args, **kwargs, **cfg_)


def build_norm_layer(cfg, num_features, postfix=''):
    cfg_ = dict(cfg)
    layer_type = cfg_.pop('type')
    abbr = _NORM_ABBR[layer_type]
    name = abbr + str(postfix)
    requires_grad = cfg_.pop('requires_grad', True)
    cfg_.setdefault('eps', 1e-5)
    if layer_type == 'GN':
        layer = nn.GroupNorm(num_channels=num_features, **cfg_)
    elif layer_type == 'LN':
        layer = nn.LayerNorm(num_features, **cfg_)
    else:
        layer = NORM_LAYERS[layer_type](num_features, **cfg_)
    for p in layer.parameters():
        p.requires_grad = requires_grad
    return name, layer


def build_activation_layer(cfg):
    cfg_ = dict(cfg)
    layer_type = cfg_.pop('type')
    return ACT_LAYERS[layer_type](**cfg_)


def build_upsample_layer(cfg, *args, **kwargs):
    cfg_ = dict(cfg)
    layer_type = cfg_.pop('type')
    if layer_type == 'deconv':
        return nn.ConvTranspose2d(*args, **kwargs, **cfg_)
    if layer_type in ('nearest', 'bilinear'):
        return nn.Upsample(mode=layer_type, **cfg_)
    if layer_type == 'carafe':
        from ..ops.carafe import CARAFEPack
        return CARAFEPack(*args, **kwargs, **cfg_)
    raise KeyError(layer_type)


def build_plugin_layer(cfg, postfix='', **kwargs):
    raise NotImplementedError('plugin layers not needed by golden tests')


def is_norm(layer, exclude=None):
    norms = (nn.BatchNorm1d, nn.BatchNorm2d, nn.BatchNorm3d,
             nn.GroupNorm, nn.LayerNorm, nn.InstanceNorm2d)
    if exclude is not None:
        exclude = exclude if isinstance(exclude, tuple) else (exclude,)
        if isinstance(layer, exclude):
            return False
    return isinstance(layer, norms)


def constant_init(module, val, bias=0):
    if hasattr(module, 'weight') and module.weight is not None:
        nn.init.constant_(module.weight, val)
    if hasattr(module, 'bias') and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def normal_init(module, mean=0, std=1, bias=0):
    if hasattr(module, 'weight') and module.weight is not None:
        nn.init.normal_(module.weight, mean, std)
    if hasattr(module, 'bias') and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def uniform_init(module, a=0, b=1, bias=0):
    if hasattr(module, 'weight') and module.weight is not None:
        nn.init.uniform_(module.weight, a, b)
    if hasattr(module, 'bias') and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def xavier_init(module, gain=1, bias=0, distribution='normal'):
    if hasattr(module, 'weight') and module.weight is not None:
        if distribution == 'uniform':
            nn.init.xavier_uniform_(module.weight, gain=gain)
        else:
            nn.init.xavier_normal_(module.weight, gain=gain)
    if hasattr(module, 'bias') and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def kaiming_init(module, a=0, mode='fan_out', nonlinearity='relu',
                 bias=0, distribution='normal'):
    if hasattr(module, 'weight') and module.weight is not None:
        if distribution == 'uniform':
            nn.init.kaiming_uniform_(module.weight, a=a, mode=mode,
                                     nonlinearity=nonlinearity)
        else:
            nn.init.kaiming_normal_(module.weight, a=a, mode=mode,
                                    nonlinearity=nonlinearity)
    if hasattr(module, 'bias') and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def caffe2_xavier_init(module, bias=0):
    kaiming_init(module, a=1, mode='fan_in', nonlinearity='leaky_relu',
                 bias=bias, distribution='uniform')


def bias_init_with_prob(prior_prob):
    return float(-np.log((1 - prior_prob) / prior_prob))


def trunc_normal_init(module, mean=0, std=1, a=-2, b=2, bias=0):
    if hasattr(module, 'weight') and module.weight is not None:
        nn.init.trunc_normal_(module.weight, mean, std, a, b)
    if hasattr(module, 'bias') and module.bias is not None:
        nn.init.constant_(module.bias, bias)


class Scale(nn.Module):
    def __init__(self, scale=1.0):
        super().__init__()
        self.scale = nn.Parameter(torch.tensor(scale, dtype=torch.float))

    def forward(self, x):
        return x * self.scale


class ConvModule(nn.Module):
    """conv → norm → act block, mmcv public semantics (bias='auto')."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias='auto',
                 conv_cfg=None, norm_cfg=None,
                 act_cfg=dict(type='ReLU'), inplace=True,
                 with_spectral_norm=False, padding_mode='zeros',
                 order=('conv', 'norm', 'act')):
        super().__init__()
        self.with_norm = norm_cfg is not None
        self.with_activation = act_cfg is not None
        self.order = tuple(order)
        if bias == 'auto':
            bias = not self.with_norm
        self.with_bias = bias
        self.conv = build_conv_layer(conv_cfg, in_channels, out_channels,
                                     kernel_size, stride=stride,
                                     padding=padding, dilation=dilation,
                                     groups=groups, bias=bias)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = self.conv.kernel_size
        self.stride = self.conv.stride
        self.padding = self.conv.padding
        if self.with_norm:
            if self.order.index('norm') > self.order.index('conv'):
                norm_channels = out_channels
            else:
                norm_channels = in_channels
            self.norm_name, norm = build_norm_layer(norm_cfg, norm_channels)
            self.add_module(self.norm_name, norm)
        else:
            self.norm_name = None
        if self.with_activation:
            act_cfg_ = dict(act_cfg)
            if act_cfg_['type'] not in ('Tanh', 'PReLU', 'Sigmoid',
                                        'GELU'):
                act_cfg_.setdefault('inplace', inplace)
            self.activate = build_activation_layer(act_cfg_)
        self.init_weights()

    @property
    def norm(self):
        return getattr(self, self.norm_name) if self.norm_name else None

    def init_weights(self):
        if not hasattr(self.conv, 'init_weights'):
            nonlinearity = 'relu'
            a = 0
            if self.with_activation and isinstance(self.activate,
                                                   nn.LeakyReLU):
                nonlinearity = 'leaky_relu'
                a = getattr(self.activate, 'negative_slope', 0.01)
            kaiming_init(self.conv, a=a, nonlinearity=nonlinearity)
        if self.with_norm:
            constant_init(self.norm, 1, bias=0)

    def forward(self, x, activate=True, norm=True):
        for layer in self.order:
            if layer == 'conv':
                x = self.conv(x)
            elif layer == 'norm' and norm and self.with_norm:
                x = self.norm(x)
            elif layer == 'act' and activate and self.with_activation:
                x = self.activate(x)
        return x


class DepthwiseSeparableConvModule(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, norm_cfg=None,
                 act_cfg=dict(type='ReLU'), **kwargs):
        super().__init__()
        self.depthwise_conv = ConvModule(
            in_channels, in_channels, kernel_size, stride=stride,
            padding=padding, dilation=dilation, groups=in_channels,
            norm_cfg=norm_cfg, act_cfg=act_cfg, **kwargs)
        self.pointwise_conv = ConvModule(in_channels, out_channels, 1,
                                         norm_cfg=norm_cfg,
                                         act_cfg=act_cfg, **kwargs)

    def forward(self, x):
        return self.pointwise_conv(self.depthwise_conv(x))


class VGG(nn.Module):
    """Pure-torch mmcv.cnn.VGG (plain conv/relu/maxpool Sequential with
    mmcv's stage arch and layer indexing; with_bn unsupported). Only
    the pieces SSDVGG consumes: ``self.features`` and the ceil_mode /
    with_last_pool / dilation knobs."""

    arch_settings = {11: (1, 1, 2, 2, 2), 13: (2, 2, 2, 2, 2),
                     16: (2, 2, 3, 3, 3), 19: (2, 2, 4, 4, 4)}

    def __init__(self, depth, with_bn=False, num_classes=-1,
                 num_stages=5, dilations=(1, 1, 1, 1, 1),
                 out_indices=(0, 1, 2, 3, 4), frozen_stages=-1,
                 bn_eval=True, bn_frozen=False, ceil_mode=False,
                 with_last_pool=True):
        super().__init__()
        assert not with_bn, 'stub VGG supports with_bn=False only'
        blocks = self.arch_settings[depth][:num_stages]
        layers = []
        in_c, out_c = 3, 64
        for si, n in enumerate(blocks):
            d = dilations[si]
            for _ in range(n):
                layers.append(nn.Conv2d(in_c, out_c, 3, padding=d,
                                        dilation=d))
                layers.append(nn.ReLU(inplace=True))
                in_c = out_c
            layers.append(nn.MaxPool2d(2, 2, ceil_mode=ceil_mode))
            out_c = min(out_c * 2, 512)
        if not with_last_pool:
            layers.pop()
        self.features = nn.Sequential(*layers)
        self.out_indices = out_indices

    def forward(self, x):
        outs = []
        for i, layer in enumerate(self.features):
            x = layer(x)
        return x


from . import bricks  # noqa: E402
from .bricks import NonLocal2d  # noqa: E402
