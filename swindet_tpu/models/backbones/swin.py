"""Swin Transformer backbone — TPU-native JAX implementation.

Re-designed from the reference's behaviour (reference:
mmdet/models/backbones/swin_transformer.py:449 — PatchEmbed :405,
BasicLayer :301, SwinTransformerBlock :156, WindowAttention :73,
PatchMerging :258) with TPU-first choices:

- NHWC layout throughout; all matmuls batched for the MXU.
- Shifted-window attention masks and relative-position-bias indices are
  *trace-time constants*: static (H, W) per padded input bucket means XLA
  constant-folds them (SURVEY.md §5.7).
- bf16 compute policy via ``dtype``; LayerNorms and softmax in fp32
  (mirrors the reference's force_fp32/apex-O1 boundaries).
- Per-block gradient checkpointing via ``use_checkpoint`` → nn.remat.

Module/param naming tracks the torch layout (layers{i}/blocks{j}/attn/qkv
etc.) so the checkpoint converter (swindet_tpu/checkpoint.py) is a pure
renaming + transpose pass.
"""
from __future__ import annotations

import functools
import os
from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import BACKBONES
from ..layers import DenseParams, DropPath, Mlp, trunc_normal_init
from ...ops.layer_norm import FusedLayerNorm

Dtype = Any


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) → (B*nW, ws, ws, C); H, W divisible by ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B*nW, ws, ws, C) → (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=128)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(wh*ww, wh*ww) lookup into the (2wh-1)*(2ww-1) bias table
    (reference: swin_transformer.py:97-111)."""
    coords_h = np.arange(wh)
    coords_w = np.arange(ww)
    coords = np.stack(np.meshgrid(coords_h, coords_w, indexing='ij'))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).copy()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=256)
def window_gather_indices(h: int, w: int, ws: int, shift: int):
    """Fold pad + cyclic roll + window partition into ONE gather.

    Returns (idx, valid, inv_idx) numpy constants:
    - idx (nW*N,): flat (h*W+w) source index per window token (0 where
      the token falls in the pad region),
    - valid (nW*N,): 0/1 mask for pad tokens (zeros match the
      reference's F.pad semantics, swin_transformer.py:214-218),
    - inv_idx (H*W,): window-token position that lands back on each
      original pixel (fuses window_reverse + unshift + unpad).
    """
    hp = (h + ws - 1) // ws * ws
    wp = (w + ws - 1) // ws * ws
    gr = np.arange(hp)
    gc = np.arange(wp)
    # value at rolled coords (gr, gc) comes from padded (r, c):
    r = (gr + shift) % hp
    c = (gc + shift) % wp
    rr, cc = np.meshgrid(r, c, indexing='ij')          # (hp, wp)
    valid = (rr < h) & (cc < w)
    flat = np.where(valid, rr * w + cc, 0)
    # partition rolled grid into windows
    t = flat.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    idx = t.reshape(-1).astype(np.int32)
    v = valid.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    valid_flat = v.reshape(-1).astype(np.float32)
    # inverse: original pixel (i, j) sits at rolled ((i-shift)%hp, ...)
    oi = np.arange(h)
    oj = np.arange(w)
    ri = (oi - shift) % hp
    cj = (oj - shift) % wp
    rri, ccj = np.meshgrid(ri, cj, indexing='ij')
    wi = (rri // ws) * (wp // ws) + ccj // ws
    tok = (rri % ws) * ws + ccj % ws
    inv_idx = (wi * (ws * ws) + tok).reshape(-1).astype(np.int32)
    return idx, valid_flat, inv_idx


@functools.lru_cache(maxsize=256)
def _fold_unfold_fns(h: int, w: int, ws: int, shift: int):
    """custom-VJP fold/unfold gathers for one (h, w, ws, shift).

    fold:   (B, H*W, C) -> (B, nW*N, C)   pad+roll+window partition
    unfold: (B, nW*N, C) -> (B, H*W, C)   the exact inverse

    The index map restricted to valid positions is a bijection, so each
    direction's VJP is a GATHER with the inverse table (pad slots carry
    zero cotangent by construction). Without this, XLA derives the
    gather's transpose as a scatter-add — profiled at 3.1 ms per
    stage-1 fold on v5e (~25 GB/s effective, 30x off bandwidth) vs
    ~0.25 ms for the equivalent gather.
    """
    idx, valid, inv_idx = window_gather_indices(h, w, ws, shift)
    need_mask = not bool(valid.all())

    def _mask(t):
        return t * jnp.asarray(valid)[None, :, None].astype(t.dtype)

    @jax.custom_vjp
    def fold(x):
        y = x[:, idx, :]
        return _mask(y) if need_mask else y

    def fold_fwd(x):
        return fold(x), None

    def fold_bwd(_, g):
        # dx[s] = g[inv_idx[s]]: the unique valid window slot reading s
        return (g[:, inv_idx, :],)

    fold.defvjp(fold_fwd, fold_bwd)

    @jax.custom_vjp
    def unfold(x):
        return x[:, inv_idx, :]

    def unfold_fwd(x):
        return unfold(x), None

    def unfold_bwd(_, g):
        # dX[p] = g[idx[p]] for valid slots, 0 for pad slots
        d = g[:, idx, :]
        return (_mask(d) if need_mask else d,)

    unfold.defvjp(unfold_fwd, unfold_bwd)
    return fold, unfold


@functools.lru_cache(maxsize=256)
def shifted_window_attn_mask(hp: int, wp: int, ws: int,
                             shift: int) -> Optional[np.ndarray]:
    """Additive (-100/0) mask (nW, N, N) for SW-MSA, computed on static
    padded sizes (reference: swin_transformer.py:370-389). None when no
    shift (all windows homogeneous)."""
    if shift == 0:
        return None
    img_mask = np.zeros((1, hp, wp, 1), np.float32)
    h_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    w_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for hs in h_slices:
        for wsl in w_slices:
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    x = img_mask.reshape(1, hp // ws, ws, wp // ws, ws, 1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = x[:, None, :] - x[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class PatchifyDense(nn.Module):
    """4×4/s4 patchify as space-to-depth + matmul (avoids the 42×
    lane-padding of a C=3 conv on TPU). Param layout matches nn.Conv
    (HWIO kernel + bias) so torch checkpoints convert unchanged."""
    embed_dim: int
    patch_size: int = 4
    in_chans: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ps = self.patch_size
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (ps, ps, self.in_chans, self.embed_dim))
        bias = self.param('bias', nn.initializers.zeros,
                          (self.embed_dim,))
        b, h, w, ci = x.shape
        x = x.astype(self.dtype)  # cast before the reshape: halves bytes
        x = x.reshape(b, h // ps, ps, w // ps, ps, ci)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h // ps, w // ps, ps * ps * ci)
        y = jnp.dot(x, kernel.reshape(-1, self.embed_dim).astype(self.dtype))
        return y + bias.astype(self.dtype)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference: swin_transformer.py:73).

    Runs on (B_, N, C) windows; QKV in compute ``dtype`` (bf16 on TPU),
    logits + softmax accumulated in fp32.
    """
    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    fused: Optional[bool] = None  # None = auto (Pallas kernel on TPU)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        b_, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = self.qk_scale or hd ** -0.5

        wh, ww = self.window_size
        table = self.param(
            'relative_position_bias_table', trunc_normal_init(),
            ((2 * wh - 1) * (2 * ww - 1), nh))
        idx = relative_position_index(wh, ww).reshape(-1)
        bias = table[idx].reshape(n, n, nh)        # N,N,nH (fp32)
        bias = bias.transpose(2, 0, 1)              # nH,N,N

        # v4 fold (opt-in): qkv GEMM + attention + out-proj in ONE
        # Pallas kernel — the packed qkv and the attention output never
        # round-trip HBM (ops/window_attention_v4.py). Param tree is
        # identical to the Dense path (qkv/kernel, proj/kernel, ...).
        if (os.environ.get('SWINDET_WATTN_V4') == '1'
                and self.attn_drop == 0.0 and self.proj_drop == 0.0
                and self.qk_scale is None):
            wqkv = DenseParams(c, 3 * c, self.qkv_bias, name='qkv')()
            wproj = DenseParams(c, c, True, name='proj')()
            from ...ops.window_attention_v4 import (
                window_attention_v4, window_attention_v4_reference)
            bqkv = wqkv[1] if wqkv[1] is not None \
                else jnp.zeros((3 * c,), jnp.float32)
            m32 = None if mask is None else mask.astype(jnp.float32)
            if jax.default_backend() == 'tpu':
                return window_attention_v4(
                    x, wqkv[0], bqkv, bias.astype(jnp.float32), m32,
                    wproj[0], wproj[1], num_heads=nh).astype(self.dtype)
            return window_attention_v4_reference(
                x, wqkv[0], bqkv, bias.astype(jnp.float32), m32,
                wproj[0], wproj[1], num_heads=nh).astype(self.dtype)

        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_init(), name='qkv')(x)

        fused = self.fused
        if fused is None:
            fused = (jax.default_backend() == 'tpu'
                     and self.attn_drop == 0.0
                     and self.qk_scale is None)
        if fused:
            from ...ops.window_attention_v3 import window_attention_v3
            out = window_attention_v3(qkv, bias.astype(jnp.float32),
                                      None if mask is None
                                      else mask.astype(jnp.float32),
                                      num_heads=nh)
        else:
            qkv = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]        # (B_, nH, N, hd)

            attn = jnp.einsum('bhnd,bhmd->bhnm', q * scale, k,
                              preferred_element_type=jnp.float32)
            attn = attn + bias[None].astype(attn.dtype)
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.reshape(b_ // nw, nw, nh, n, n)
                attn = attn + mask[None, :, None].astype(attn.dtype)
                attn = attn.reshape(b_, nh, n, n)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
            attn = attn.astype(self.dtype)
            if self.attn_drop > 0:
                attn = nn.Dropout(self.attn_drop)(
                    attn, deterministic=deterministic)
            out = jnp.einsum('bhnm,bhmd->bhnd', attn,
                             v.astype(self.dtype))
            out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        out = out.astype(self.dtype)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal_init(),
                       name='proj')(out)
        if self.proj_drop > 0:
            out = nn.Dropout(self.proj_drop)(out,
                                             deterministic=deterministic)
        return out


class SwinBlock(nn.Module):
    """One Swin block: LN → (pad → cyclic shift → W-MSA → unshift → unpad)
    → +residual → LN → MLP (reference: swin_transformer.py:156-250)."""
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        b, h, w, c = x.shape
        ws, shift = self.window_size, self.shift_size

        shortcut = x
        # LN IO in compute dtype; statistics stay fp32 inside flax
        y = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm1')(x)

        hp = (h + ws - 1) // ws * ws
        wp = (w + ws - 1) // ws * ws

        # pad + cyclic roll + window partition folded into ONE gather
        # (and the reverse into one inverse gather) — replaces 2 pads +
        # 2 rolls + 2 reshape/transpose copies per block. Both carry
        # gather (not scatter) backwards: see _fold_unfold_fns.
        fold, unfold = _fold_unfold_fns(h, w, ws, shift)
        n = ws * ws
        y = fold(y.reshape(b, h * w, c))
        windows = y.reshape(b * (hp // ws) * (wp // ws), n, c)

        mask = shifted_window_attn_mask(hp, wp, ws, shift) \
            if shift > 0 else None
        attn = WindowAttention(
            dim=self.dim, window_size=(ws, ws), num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            dtype=self.dtype, name='attn')(
                windows, mask, deterministic=deterministic)
        y = unfold(attn.reshape(b, -1, c)).reshape(b, h, w, c)

        dp = DropPath(self.drop_path, name='drop_path')
        x = shortcut + dp(y, deterministic=deterministic)

        z = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm2')(x)
        z = Mlp(hidden_features=int(c * self.mlp_ratio), out_features=c,
                drop=self.drop, dtype=self.dtype, name='mlp')(
                    z, deterministic=deterministic)
        return x + dp(z, deterministic=deterministic)


class PatchMerging(nn.Module):
    """2×2 space-to-depth + LN + Linear 4C→2C
    (reference: swin_transformer.py:258)."""
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm')(x)
        x = nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name='reduction')(x)
        return x


class BasicLayer(nn.Module):
    """One Swin stage: blocks (alternating shift 0, ws//2) + optional
    PatchMerging (reference: swin_transformer.py:301)."""
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: Optional[float]
    drop: float
    attn_drop: float
    drop_path: Tuple[float, ...]
    downsample: bool
    use_checkpoint: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        block_cls = SwinBlock
        if self.use_checkpoint:
            block_cls = nn.remat(SwinBlock, static_argnums=(2,))
        for j in range(self.depth):
            x = block_cls(
                dim=self.dim, num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if j % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, drop=self.drop,
                attn_drop=self.attn_drop, drop_path=self.drop_path[j],
                dtype=self.dtype, name=f'blocks{j}')(x, deterministic)
        out = x
        if self.downsample:
            x = PatchMerging(dim=self.dim, dtype=self.dtype,
                             name='downsample')(x)
        return out, x


@BACKBONES.register_module()
class SwinTransformer(nn.Module):
    """Hierarchical Swin backbone: 4 stages, strides 4/8/16/32
    (reference: swin_transformer.py:449).

    Variants via config: T(96,[2,2,6,2]), S(96,[2,2,18,2]), B(128,[2,2,18,2]).
    Returns a tuple of NHWC feature maps for ``out_indices``, each passed
    through its own LayerNorm (reference :550-553).
    """
    pretrain_img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    ape: bool = False
    patch_norm: bool = True
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    use_checkpoint: bool = False
    dtype: Dtype = jnp.float32

    @property
    def num_features(self):
        return [int(self.embed_dim * 2 ** i) for i in range(len(self.depths))]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x: (B, H, W, 3) NHWC; returns tuple of NHWC stage features."""
        deterministic = not train
        ps = self.patch_size
        b, h, w, _ = x.shape
        if h % ps or w % ps:
            x = jnp.pad(x, ((0, 0), (0, (ps - h % ps) % ps),
                            (0, (ps - w % ps) % ps), (0, 0)))

        # PatchEmbed (reference :405): 4×4/s4 conv patchify == space-to-
        # depth + matmul. The conv form keeps C=3 on lanes (padded 42×
        # by TPU tiling); the matmul form reads the image once. Params
        # stay conv-shaped (HWIO) for checkpoint compatibility.
        x = PatchifyDense(embed_dim=self.embed_dim, patch_size=ps,
                          dtype=self.dtype, name='patch_embed.proj')(x)
        if self.patch_norm:
            x = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype,
                               name='patch_embed.norm')(x)

        wh, ww = x.shape[1], x.shape[2]
        if self.ape:
            pe_hw = self.pretrain_img_size // ps
            ape = self.param('absolute_pos_embed', trunc_normal_init(),
                             (1, pe_hw, pe_hw, self.embed_dim))
            if (pe_hw, pe_hw) != (wh, ww):
                # torch-exact bicubic (reference swin_transformer.py:607)
                from ...ops.interpolate import torch_bicubic_resize
                ape = torch_bicubic_resize(ape, (wh, ww))
            x = x + ape.astype(self.dtype)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)

        num_layers = len(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        outs = []
        for i in range(num_layers):
            start = sum(self.depths[:i])
            out, x = BasicLayer(
                dim=int(self.embed_dim * 2 ** i),
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=tuple(dpr[start:start + self.depths[i]]),
                downsample=i < num_layers - 1,
                use_checkpoint=self.use_checkpoint,
                dtype=self.dtype,
                name=f'layers{i}')(x, deterministic)
            if i in self.out_indices:
                out = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype,
                                     name=f'norm{i}')(out)
                outs.append(out)
        return tuple(outs)
