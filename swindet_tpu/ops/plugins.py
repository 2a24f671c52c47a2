"""Backbone plugins: ContextBlock (GCNet, arXiv:1904.11492) and
GeneralizedAttention (arXiv:1904.05873).

Reference usage: configs/gcnet/* inject ``ContextBlock`` and
configs/empirical_attention/* inject ``GeneralizedAttention`` into
ResNet bottlenecks via the ``plugins=[dict(cfg=..., stages=...,
position='after_convN')]`` backbone option (reference:
mmdet/models/backbones/resnet.py:263 make_block_plugins; the plugin
implementations live in mmcv.cnn). Both are implemented here natively
as flax modules: ContextBlock is a softmax-pooled global context with
a zero-init channel-add bottleneck; GeneralizedAttention is multi-head
attention over a strided key/value grid with the four energy terms of
the empirical-attention paper (query⋅key, query⋅geometry, bias⋅key,
bias⋅geometry) selected by ``attention_type`` bits, computed in one
einsum per term — TPU-friendly static shapes, no gather.
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class ContextBlock(nn.Module):
    """GCNet global-context block (mmcv ContextBlock).

    context = Σ_hw x · softmax(conv_mask(x)); out = x +
    conv2(relu(LN(conv1(context)))) with the last conv zero-init so the
    block starts as identity.
    """
    in_channels: int
    ratio: float = 1. / 16
    pooling_type: str = 'att'
    fusion_types: Sequence[str] = ('channel_add',)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        planes = int(self.in_channels * self.ratio)
        xf = x.astype(jnp.float32)
        if self.pooling_type == 'att':
            mask = nn.Conv(1, (1, 1), dtype=jnp.float32,
                           name='conv_mask')(xf)          # (B,H,W,1)
            mask = jax.nn.softmax(mask.reshape(b, h * w, 1), axis=1)
            context = jnp.einsum('bnc,bn1->bc', xf.reshape(b, h * w, c),
                                 mask).reshape(b, 1, 1, c)
        else:                                             # 'avg'
            context = xf.mean(axis=(1, 2), keepdims=True)

        def transform(name):
            t = nn.Conv(planes, (1, 1), dtype=jnp.float32,
                        name=f'{name}.0')(context)
            t = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f'{name}.1')(t)
            t = nn.relu(t)
            return nn.Conv(c, (1, 1), dtype=jnp.float32,
                           kernel_init=nn.initializers.zeros,
                           name=f'{name}.3')(t)

        out = xf
        if 'channel_mul' in self.fusion_types:
            out = out * jax.nn.sigmoid(transform('channel_mul_conv'))
        if 'channel_add' in self.fusion_types:
            out = out + transform('channel_add_conv')
        return out.astype(x.dtype)


def _sine_position_embedding(idxs_q: np.ndarray, idxs_kv: np.ndarray,
                             feat_dim: int,
                             magnitude: float) -> jnp.ndarray:
    """Relative sinusoid embedding (Nq, Nkv, feat_dim) between two 1-D
    coordinate grids (empirical-attention geometry features)."""
    rel = (idxs_q[:, None] - idxs_kv[None, :]) / magnitude
    half = feat_dim // 2
    freq = 100.0 ** (np.arange(half, dtype=np.float64) / half)
    ang = rel[..., None] / freq                          # (Nq,Nkv,half)
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)
    return jnp.asarray(emb, jnp.float32)


class GeneralizedAttention(nn.Module):
    """Empirical-attention block. ``attention_type`` is a 4-bit string
    selecting energy terms: [0] query⊤key, [1] query⊤geometry,
    [2] bias⊤key, [3] bias⊤geometry ('0010' = key-content-only, the
    cheapest variant used by configs/empirical_attention)."""
    in_channels: int
    spatial_range: int = -1
    num_heads: int = 9
    position_embedding_dim: int = -1
    position_magnitude: float = 1.0
    kv_stride: int = 2
    q_stride: int = 1
    attention_type: str = '1111'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bits = [bool(int(b)) for b in self.attention_type]
        b, h, w, c = x.shape
        heads = self.num_heads
        qk_dim = c // heads
        out_c = qk_dim * heads
        pos_dim = (self.position_embedding_dim
                   if self.position_embedding_dim > 0 else c)
        xf = x.astype(jnp.float32)

        x_q = xf[:, ::self.q_stride, ::self.q_stride]
        x_kv = xf[:, ::self.kv_stride, ::self.kv_stride]
        hq, wq = x_q.shape[1:3]
        hk, wk = x_kv.shape[1:3]

        scale = 1.0 / math.sqrt(qk_dim)
        if bits[0] or bits[1]:
            q = nn.Conv(out_c, (1, 1), use_bias=False,
                        dtype=jnp.float32, name='query_conv')(x_q)
            q = q.reshape(b, hq * wq, heads, qk_dim) * scale
        if bits[0] or bits[2]:
            k = nn.Conv(out_c, (1, 1), use_bias=False,
                        dtype=jnp.float32, name='key_conv')(x_kv)
            k = k.reshape(b, hk * wk, heads, qk_dim)
        v = nn.Conv(out_c, (1, 1), use_bias=False, dtype=jnp.float32,
                    name='value_conv')(x_kv)
        v = v.reshape(b, hk * wk, heads, qk_dim)

        energy = jnp.zeros((b, heads, hq * wq, hk * wk), jnp.float32)
        if bits[0]:
            energy = energy + jnp.einsum('bnhd,bmhd->bhnm', q, k)
        if bits[2]:
            appr_bias = self.param(
                'appr_bias',
                nn.initializers.normal(1.0 / math.sqrt(qk_dim * 2)),
                (heads, qk_dim))
            energy = energy + jnp.einsum(
                'hd,bmhd->bhm', appr_bias, k)[:, :, None, :]

        if bits[1] or bits[3]:
            # Separable y/x relative-position embeddings projected per
            # head, added with broadcasting over the other axis.
            emb_y = _sine_position_embedding(
                np.arange(hq) * self.q_stride,
                np.arange(hk) * self.kv_stride, pos_dim // 2,
                self.position_magnitude)
            emb_x = _sine_position_embedding(
                np.arange(wq) * self.q_stride,
                np.arange(wk) * self.kv_stride, pos_dim // 2,
                self.position_magnitude)
            py = nn.Dense(out_c, dtype=jnp.float32,
                          name='appr_geom_fc_y')(emb_y)
            px = nn.Dense(out_c, dtype=jnp.float32,
                          name='appr_geom_fc_x')(emb_x)
            py = py.reshape(hq, hk, heads, qk_dim)
            px = px.reshape(wq, wk, heads, qk_dim)
            if bits[1]:
                qg = q.reshape(b, hq, wq, heads, qk_dim)
                ey = jnp.einsum('byxhd,yuhd->bhyxu', qg, py)
                ex = jnp.einsum('byxhd,xvhd->bhyxv', qg, px)
            else:
                ey = ex = 0.0
            if bits[3]:
                geom_bias = self.param(
                    'geom_bias',
                    nn.initializers.normal(1.0 / math.sqrt(pos_dim)),
                    (heads, qk_dim))
                ey = ey + jnp.einsum('yuhd,hd->hyu', py,
                                     geom_bias)[None, :, :, None, :]
                ex = ex + jnp.einsum('xvhd,hd->hxv', px,
                                     geom_bias)[None, :, None, :, :]
            # e[b,h,(y,x),(u,v)] = ey[b,h,y,x,u] + ex[b,h,y,x,v]
            e = jnp.broadcast_to(
                jnp.asarray(ey)[..., :, None]
                + jnp.asarray(ex)[..., None, :],
                (b, heads, hq, wq, hk, wk))
            energy = energy + e.reshape(b, heads, hq * wq, hk * wk)

        if self.spatial_range > 0:
            yy_q = np.repeat(np.arange(hq) * self.q_stride, wq)
            xx_q = np.tile(np.arange(wq) * self.q_stride, hq)
            yy_k = np.repeat(np.arange(hk) * self.kv_stride, wk)
            xx_k = np.tile(np.arange(wk) * self.kv_stride, hk)
            keep = ((np.abs(yy_q[:, None] - yy_k[None, :])
                     <= self.spatial_range) &
                    (np.abs(xx_q[:, None] - xx_k[None, :])
                     <= self.spatial_range))
            energy = jnp.where(jnp.asarray(keep)[None, None], energy,
                               -1e9)

        attn = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum('bhnm,bmhd->bnhd', attn, v)
        out = out.reshape(b, hq, wq, out_c)
        if self.q_stride > 1:
            out = jax.image.resize(out, (b, h, w, out_c), 'nearest')
        out = nn.Conv(c, (1, 1), dtype=jnp.float32,
                      name='proj_conv')(out)
        gamma = self.param('gamma', nn.initializers.zeros, (1,))
        return (xf + gamma * out).astype(x.dtype)


PLUGIN_TYPES = {
    'ContextBlock': ContextBlock,
    'GeneralizedAttention': GeneralizedAttention,
}


def build_plugin(cfg: dict, in_channels: int, name: str,
                 dtype: Any = jnp.float32) -> nn.Module:
    cfg = dict(cfg)
    t = cfg.pop('type')
    cfg.pop('postfix', None)
    return PLUGIN_TYPES[t](in_channels=in_channels, dtype=dtype,
                           name=name, **cfg)
