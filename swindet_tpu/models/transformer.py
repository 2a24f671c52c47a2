"""Transformer building blocks for set-prediction detectors (reference:
mmdet/models/utils/transformer.py, positional_encoding.py).

TPU-native design notes vs the reference:
  - batch-first (B, L, D) layout throughout — contiguous GEMMs on the
    MXU instead of torch's (L, B, D) permutes;
  - attention is one fused einsum chain per layer; padding enters as an
    additive -1e9 bias (static shapes, XLA fuses the mask add into the
    softmax);
  - the sine positional encoding is a cumsum over the valid-pixel mask,
    identical numerics to SinePositionalEncoding (reference
    positional_encoding.py:49-79).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def sine_positional_encoding(not_pad: jnp.ndarray, num_feats: int,
                             temperature: float = 10000.,
                             normalize: bool = False,
                             scale: float = 2 * math.pi,
                             eps: float = 1e-6) -> jnp.ndarray:
    """(B, H, W) valid mask (True = real pixel) -> (B, H, W, 2*num_feats).

    Reference: SinePositionalEncoding.forward
    (positional_encoding.py:49) — y/x cumsum over valid pixels,
    interleaved sin/cos, y-block then x-block on the channel axis.
    """
    nm = not_pad.astype(jnp.float32)
    y_embed = jnp.cumsum(nm, axis=1)
    x_embed = jnp.cumsum(nm, axis=2)
    if normalize:
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class LearnedPositionalEncoding(nn.Module):
    """(reference: positional_encoding.py LearnedPositionalEncoding)."""
    num_feats: int = 128
    row_num_embed: int = 50
    col_num_embed: int = 50

    @nn.compact
    def __call__(self, h: int, w: int) -> jnp.ndarray:
        row = self.param('row_embed', nn.initializers.uniform(1.0),
                         (self.row_num_embed, self.num_feats))
        col = self.param('col_embed', nn.initializers.uniform(1.0),
                         (self.col_num_embed, self.num_feats))
        pos = jnp.concatenate([
            jnp.broadcast_to(col[None, :w], (h, w, self.num_feats)),
            jnp.broadcast_to(row[:h, None], (h, w, self.num_feats))], -1)
        return pos[None]


class MultiHeadAttention(nn.Module):
    """Post-norm residual MHA block (reference transformer.py:9
    MultiheadAttention — residual + dropout live inside the module).

    ``query_pos``/``key_pos`` are added to q/k only (DETR convention:
    values carry content, positions steer attention).
    """
    embed_dims: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, residual=None, query_pos=None,
                 key_pos=None, key_padding_mask=None,
                 deterministic: bool = True):
        """query (B, Lq, D); key/value (B, Lk, D);
        key_padding_mask (B, Lk) bool, True = PAD (ignored)."""
        if residual is None:
            residual = query
        q = query if query_pos is None else query + query_pos
        k = key if key_pos is None else key + key_pos
        d = self.embed_dims
        nh = self.num_heads
        hd = d // nh
        # packed qkv projection (torch nn.MultiheadAttention layout)
        qp = nn.Dense(d, dtype=self.dtype, name='q_proj')(q)
        kp = nn.Dense(d, dtype=self.dtype, name='k_proj')(k)
        vp = nn.Dense(d, dtype=self.dtype, name='v_proj')(value)
        b, lq, _ = qp.shape
        lk = kp.shape[1]
        qp = qp.reshape(b, lq, nh, hd)
        kp = kp.reshape(b, lk, nh, hd)
        vp = vp.reshape(b, lk, nh, hd)
        attn = jnp.einsum('bqhd,bkhd->bhqk', qp, kp).astype(jnp.float32)
        attn = attn * (hd ** -0.5)
        if key_padding_mask is not None:
            attn = attn + jnp.where(key_padding_mask[:, None, None, :],
                                    -1e9, 0.0)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        if self.dropout > 0:
            attn = nn.Dropout(self.dropout)(attn,
                                            deterministic=deterministic)
        out = jnp.einsum('bhqk,bkhd->bqhd', attn, vp).reshape(b, lq, d)
        out = nn.Dense(d, dtype=self.dtype, name='out_proj')(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out,
                                           deterministic=deterministic)
        return residual + out


class FFN(nn.Module):
    """Feed-forward block with optional residual (reference
    transformer.py:104 FFN)."""
    embed_dims: int
    feedforward_channels: int
    num_fcs: int = 2
    dropout: float = 0.0
    add_residual: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, deterministic: bool = True):
        out = x
        for i in range(self.num_fcs - 1):
            out = nn.Dense(self.feedforward_channels, dtype=self.dtype,
                           name=f'fc{i}')(out)
            out = nn.relu(out)
            if self.dropout > 0:
                out = nn.Dropout(self.dropout)(
                    out, deterministic=deterministic)
        out = nn.Dense(self.embed_dims, dtype=self.dtype,
                       name=f'fc{self.num_fcs - 1}')(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out,
                                           deterministic=deterministic)
        if not self.add_residual:
            return out
        return (x if residual is None else residual) + out


class DetrTransformerEncoderLayer(nn.Module):
    """post-norm: selfattn -> LN -> FFN -> LN (transformer.py:171)."""
    embed_dims: int
    num_heads: int
    feedforward_channels: int
    dropout: float = 0.1
    num_fcs: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos=None, key_padding_mask=None,
                 deterministic: bool = True):
        x = MultiHeadAttention(self.embed_dims, self.num_heads,
                               self.dropout, self.dtype, name='self_attn')(
            x, x, x, query_pos=pos, key_pos=pos,
            key_padding_mask=key_padding_mask,
            deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm1')(x)
        x = FFN(self.embed_dims, self.feedforward_channels, self.num_fcs,
                self.dropout, dtype=self.dtype, name='ffn')(
            x, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm2')(x)


class DetrTransformerDecoderLayer(nn.Module):
    """post-norm: selfattn -> LN -> crossattn -> LN -> FFN -> LN
    (transformer.py:270)."""
    embed_dims: int
    num_heads: int
    feedforward_channels: int
    dropout: float = 0.1
    num_fcs: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, memory, memory_pos=None, query_pos=None,
                 memory_key_padding_mask=None, deterministic: bool = True):
        x = MultiHeadAttention(self.embed_dims, self.num_heads,
                               self.dropout, self.dtype, name='self_attn')(
            x, x, x, query_pos=query_pos, key_pos=query_pos,
            deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm1')(x)
        x = MultiHeadAttention(self.embed_dims, self.num_heads,
                               self.dropout, self.dtype,
                               name='cross_attn')(
            x, memory, memory, query_pos=query_pos, key_pos=memory_pos,
            key_padding_mask=memory_key_padding_mask,
            deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm2')(x)
        x = FFN(self.embed_dims, self.feedforward_channels, self.num_fcs,
                self.dropout, dtype=self.dtype, name='ffn')(
            x, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm3')(x)


class DetrTransformer(nn.Module):
    """DETR encoder-decoder (reference transformer.py:601 Transformer).

    __call__(x_seq, key_padding_mask, query_embed, pos_seq) with
    batch-first sequences; returns (num_dec_layers, B, Q, D) decoder
    intermediates (return_intermediate semantics: each layer's output
    passed through the shared final LN — transformer.py:568-576) and
    the encoder memory.
    """
    embed_dims: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    feedforward_channels: int = 2048
    dropout: float = 0.1
    num_fcs: int = 2
    return_intermediate_dec: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, key_padding_mask, query_embed, pos,
                 deterministic: bool = True):
        b = x.shape[0]
        for i in range(self.num_encoder_layers):
            x = DetrTransformerEncoderLayer(
                self.embed_dims, self.num_heads, self.feedforward_channels,
                self.dropout, self.num_fcs, self.dtype,
                name=f'enc{i}')(x, pos=pos,
                                key_padding_mask=key_padding_mask,
                                deterministic=deterministic)
        memory = x
        q = jnp.broadcast_to(query_embed[None].astype(self.dtype),
                             (b,) + query_embed.shape)
        tgt = jnp.zeros_like(q)
        final_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='dec_norm')
        inter = []
        for i in range(self.num_decoder_layers):
            tgt = DetrTransformerDecoderLayer(
                self.embed_dims, self.num_heads, self.feedforward_channels,
                self.dropout, self.num_fcs, self.dtype,
                name=f'dec{i}')(tgt, memory, memory_pos=pos, query_pos=q,
                                memory_key_padding_mask=key_padding_mask,
                                deterministic=deterministic)
            if self.return_intermediate_dec:
                inter.append(final_ln(tgt))
        if self.return_intermediate_dec:
            return jnp.stack(inter, 0), memory
        return final_ln(tgt)[None], memory


class DynamicConv(nn.Module):
    """Proposal-conditioned 1x1 dynamic convolution (reference
    transformer.py:752 DynamicConv) — two per-proposal GEMMs generated
    from the proposal feature, batched as one bmm einsum.
    """
    in_channels: int = 256
    feat_channels: int = 64
    out_channels: Optional[int] = None
    input_feat_shape: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, param_feature, input_feature):
        """param_feature (N, C); input_feature (N, S*S, C) — returns
        (N, out_channels)."""
        out_c = self.out_channels or self.in_channels
        n_in = self.in_channels * self.feat_channels
        n_out = out_c * self.feat_channels
        params = nn.Dense(n_in + n_out, dtype=self.dtype,
                          name='dynamic_layer')(param_feature)
        p_in = params[:, :n_in].reshape(-1, self.in_channels,
                                        self.feat_channels)
        p_out = params[:, n_in:].reshape(-1, self.feat_channels, out_c)
        feats = jnp.einsum('nsc,ncf->nsf', input_feature, p_in)
        feats = nn.relu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm_in')(
            feats))
        feats = jnp.einsum('nsf,nfo->nso', feats, p_out)
        feats = nn.relu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm_out')(
            feats))
        feats = feats.reshape(feats.shape[0], -1)
        feats = nn.Dense(out_c, dtype=self.dtype, name='fc_layer')(feats)
        return nn.relu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='fc_norm')(
            feats))
