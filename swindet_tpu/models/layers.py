"""Shared NN building blocks (TPU-native replacements for mmcv.cnn).

ConvModule (conv+norm+act), norm builders incl. SyncBN-as-mesh-pmean,
DropPath (stochastic depth), truncated-normal init. All modules run NHWC
(TPU-native layout) with a `dtype` compute policy (bf16-friendly) and
fp32 params/norms, mirroring the reference's force_fp32 boundaries.
"""
from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def trunc_normal_init(std: float = 0.02):
    """timm-style truncated normal initializer (reference: swin uses
    trunc_normal_(std=.02))."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std
    return init


def normal_init(std: float = 0.01):
    """mmcv normal_init — the reference initializes detection-head conv/fc
    prediction layers with N(0, 0.01) (reg branches often 0.001); flax's
    lecun_normal default is ~6x wider for these fan-ins and makes a
    random-init RPN emit near-full-canvas proposals."""
    return nn.initializers.normal(stddev=std)


def bias_prob_init(prior_prob: float = 0.01):
    """mmcv bias_init_with_prob — focal-loss cls layers start with the
    sigmoid output at `prior_prob` (reference: retina_head.py init_weights
    bias_cls = bias_init_with_prob(0.01) = -4.595)."""
    import math
    val = float(-math.log((1 - prior_prob) / prior_prob))
    return nn.initializers.constant(val)


xavier_init = nn.initializers.xavier_uniform


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference: timm DropPath used by
    swin_transformer.py blocks)."""
    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        if self.drop_prob == 0.0 or deterministic:
            return x
        keep = 1.0 - self.drop_prob
        rng = self.make_rng('dropout')
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class DenseParams(nn.Module):
    """Hosts kernel/bias with nn.Dense's exact names and inits, for
    paths that consume the weights directly (fused Pallas kernels)
    instead of calling Dense — the param tree stays checkpoint-
    compatible either way."""
    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param('kernel', trunc_normal_init(),
                            (self.in_features, self.out_features))
        bias = self.param('bias', nn.initializers.zeros,
                          (self.out_features,)) if self.use_bias \
            else None
        return kernel, bias


class Mlp(nn.Module):
    """fc1 → GELU → fc2 (reference: swin_transformer.py:20)."""
    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # fused fc1→gelu→fc2 (opt-in): the (tokens, hidden) activation
        # never leaves VMEM (ops/fused_mlp.py)
        # Width guard: the kernel's backward accumulates dW1+dW2 in f32
        # VMEM (2·C·4C·4 bytes); C=768 (Swin stage 4) needs 18.9 MB and
        # trips the 16 MB scoped-vmem stack limit, so wide layers keep
        # the XLA lowering.
        if (os.environ.get('SWINDET_FUSED_MLP') == '1'
                and self.drop == 0.0
                and 2 * x.shape[-1] * self.hidden_features * 4 <= 12 * 2**20):
            c = x.shape[-1]
            w1, b1 = DenseParams(c, self.hidden_features,
                                 name='fc1')()
            w2, b2 = DenseParams(self.hidden_features,
                                 self.out_features, name='fc2')()
            from ..ops.fused_mlp import fused_mlp, fused_mlp_reference
            xd = x.astype(self.dtype)
            if jax.default_backend() == 'tpu':
                return fused_mlp(xd, w1, b1, w2, b2).astype(self.dtype)
            return fused_mlp_reference(
                xd, w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype))

        x = nn.Dense(self.hidden_features, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name='fc1')(x)
        x = nn.gelu(x, approximate=False)
        if self.drop > 0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name='fc2')(x)
        if self.drop > 0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class SyncBatchNorm(nn.Module):
    """BatchNorm whose statistics reduce over batch AND the data mesh axis
    via lax.pmean — free under pjit/shard_map (SURVEY.md §2.9 SyncBN row).

    Outside a mesh context (axis_name is None or not bound) it degrades to
    plain BatchNorm.
    """
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum, epsilon=self.epsilon,
            axis_name=self.axis_name if not use_running_average else None,
            dtype=jnp.float32, name='bn')(x)


def build_norm(norm_cfg: Optional[dict], name: str = 'norm',
               dtype: Dtype = jnp.float32):
    """Norm factory from cfg dicts (reference: mmcv build_norm_layer).

    Returns a callable module or None. Norms always compute in fp32.
    """
    if norm_cfg is None:
        return None
    t = norm_cfg['type']
    if t in ('BN', 'BN2d', 'SyncBN'):
        return _NormWrapper(kind='bn', name=name,
                            momentum=1 - norm_cfg.get('momentum', 0.1),
                            eps=norm_cfg.get('eps', 1e-5),
                            requires_grad=norm_cfg.get('requires_grad', True))
    if t == 'GN':
        return _NormWrapper(kind='gn', name=name,
                            num_groups=norm_cfg.get('num_groups', 32),
                            eps=norm_cfg.get('eps', 1e-5))
    if t == 'LN':
        return _NormWrapper(kind='ln', name=name,
                            eps=norm_cfg.get('eps', 1e-5))
    raise KeyError(f'Unknown norm type {t}')


class _NormWrapper(nn.Module):
    kind: str = 'bn'
    momentum: float = 0.9
    eps: float = 1e-5
    num_groups: int = 32
    requires_grad: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == 'bn':
            return nn.BatchNorm(use_running_average=not train,
                                momentum=self.momentum, epsilon=self.eps,
                                dtype=jnp.float32)(x)
        if self.kind == 'gn':
            return nn.GroupNorm(num_groups=self.num_groups,
                                epsilon=self.eps, dtype=jnp.float32)(x)
        return nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32)(x)


_ACTS = {
    'ReLU': nn.relu,
    'GELU': lambda x: nn.gelu(x, approximate=False),
    'SiLU': nn.silu,
    'Swish': nn.silu,
    'LeakyReLU': lambda x: nn.leaky_relu(x, 0.01),
    'Sigmoid': nn.sigmoid,
    'Tanh': jnp.tanh,
}


class _Conv3x3Pallas(nn.Module):
    """3x3/s1 conv via the Pallas kernel; param layout matches nn.Conv
    ({'kernel','bias'}) so checkpoints convert unchanged."""
    out_channels: int
    relu: bool = False
    dtype: Dtype = jnp.float32
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        from ..ops.conv3x3 import conv3x3
        kernel = self.param('kernel',
                            self.kernel_init or nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.out_channels))
        bias = self.param('bias', self.bias_init or nn.initializers.zeros,
                          (self.out_channels,))
        return conv3x3(x.astype(self.dtype), kernel.astype(self.dtype),
                       bias, self.relu)


class WSConv(nn.Module):
    """Weight-standardized conv (mmcv ConvWS2d, arXiv:1903.10520):
    kernel normalized per output filter over (kh, kw, cin) before the
    conv. Param layout matches nn.Conv ({'kernel','bias'}). Reference
    usage: configs/gn+ws (conv_cfg=dict(type='ConvWS'))."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: int = 1
    padding: Any = 'SAME'
    kernel_dilation: int = 1
    feature_group_count: int = 1
    use_bias: bool = False
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1] // self.feature_group_count
        w = self.param('kernel',
                       self.kernel_init or nn.initializers.lecun_normal(),
                       (kh, kw, cin, self.features))
        w = w.astype(jnp.float32)
        mean = w.mean(axis=(0, 1, 2), keepdims=True)
        std = w.std(axis=(0, 1, 2), keepdims=True) + self.eps
        w = (w - mean) / std
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(self.strides, self.strides),
            padding=self.padding if isinstance(self.padding, str)
            else list(self.padding),
            rhs_dilation=(self.kernel_dilation,) * 2,
            feature_group_count=self.feature_group_count,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            out = out + self.param('bias',
                                   self.bias_init or nn.initializers.zeros,
                                   (self.features,))
        return out


class ConvModule(nn.Module):
    """conv (+ optional norm) (+ optional act), NHWC
    (reference: mmcv.cnn ConvModule — used by FPN, convfc heads, mask heads).
    """
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: int = 1
    padding: Union[int, str] = 0
    dilation: int = 1
    groups: int = 1
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    bias: Union[bool, str] = 'auto'
    dtype: Dtype = jnp.float32
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks, ks)
        use_bias = (self.norm_cfg is None) if self.bias == 'auto' \
            else bool(self.bias)
        if isinstance(self.padding, str):
            padding = self.padding
        else:
            padding = [(self.padding, self.padding)] * 2

        # Pallas fast path: plain 3x3/s1 conv (+bias [+ReLU]) — XLA's
        # layout assignment runs these at ~16% MXU in this model
        # (see ops/conv3x3.py); kernel needs lane-multiple channels.
        act_type = (self.act_cfg or {}).get('type')
        if (jax.default_backend() == 'tpu' and ks == (3, 3)
                and self.stride == 1 and self.dilation == 1
                and self.groups == 1 and self.padding == 1
                and self.norm_cfg is None and use_bias
                and x.shape[-1] % 128 == 0
                and self.out_channels % 128 == 0
                and act_type in (None, 'ReLU')):
            return _Conv3x3Pallas(out_channels=self.out_channels,
                                  relu=(act_type == 'ReLU'),
                                  dtype=self.dtype,
                                  kernel_init=self.kernel_init,
                                  bias_init=self.bias_init, name='conv')(x)
        if self.conv_cfg is not None and \
                self.conv_cfg.get('type') in ('DCN', 'DCNv2'):
            # deformable tower conv (reference: ConvModule with
            # conv_cfg=dict(type='DCNv2') — fcos/vfnet dcn_on_last_conv)
            from ..ops.deform_conv import ModulatedDeformConvPack
            x = ModulatedDeformConvPack(
                self.out_channels, ks[0], stride=self.stride,
                deform_groups=self.conv_cfg.get('deform_groups', 1),
                modulated=(self.conv_cfg['type'] == 'DCNv2'),
                use_bias=use_bias, dtype=self.dtype, name='conv')(x)
        elif self.conv_cfg is not None and \
                self.conv_cfg.get('type') in ('ConvWS', 'ConvAWS'):
            x = WSConv(self.out_channels, ks, strides=self.stride,
                       padding=padding, kernel_dilation=self.dilation,
                       feature_group_count=self.groups,
                       use_bias=use_bias, dtype=self.dtype,
                       kernel_init=self.kernel_init,
                       bias_init=self.bias_init, name='conv')(x)
        else:
            x = nn.Conv(self.out_channels, ks, strides=self.stride,
                        padding=padding,
                        kernel_dilation=self.dilation,
                        feature_group_count=self.groups,
                        use_bias=use_bias, dtype=self.dtype,
                        kernel_init=(self.kernel_init
                                     or nn.initializers.lecun_normal()),
                        bias_init=(self.bias_init or nn.initializers.zeros),
                        name='conv')(x)
        if self.norm_cfg is not None:
            x = build_norm(self.norm_cfg, name='norm')(x, train=train)
            x = x.astype(self.dtype)
        if self.act_cfg is not None:
            if self.act_cfg.get('type') == 'LeakyReLU':
                x = nn.leaky_relu(
                    x, self.act_cfg.get('negative_slope', 0.01))
            else:
                x = _ACTS[self.act_cfg.get('type', 'ReLU')](x)
        return x


def resize_nearest(x: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize of NHWC to (H, W) — matches torch
    F.interpolate(mode='nearest') index arithmetic (floor of src index).

    Integer upscale factors take the broadcast-reshape path (free to
    fuse on TPU); the general case falls back to two row gathers."""
    b, h, w, c = x.shape
    nh, nw = shape
    if nh % h == 0 and nw % w == 0:
        fy, fx = nh // h, nw // w
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (b, h, fy, w, fx, c))
        return x.reshape(b, nh, nw, c)
    rows = (jnp.arange(nh) * (h / nh)).astype(jnp.int32)
    cols = (jnp.arange(nw) * (w / nw)).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def max_pool_1x1_s2(x: jnp.ndarray) -> jnp.ndarray:
    """F.max_pool2d(x, 1, stride=2) equivalent — plain subsample."""
    return x[:, ::2, ::2, :]
