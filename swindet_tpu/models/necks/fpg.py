"""FPG — Feature Pyramid Grids (reference: mmdet/models/necks/
fpg.py:100; arXiv:2004.03580).

A grid of `stack_times` pathways over `num_outs` levels. Each stage
fuses (by summation) the same-stage transition (strided conv for
bottom-up), the across-pathway lateral, the across-pathway
down/up transitions and a skip from the original laterals, with
per-level `skip_inds` freezing early stages of high levels exactly as
the reference config wires it. Transitions follow the config's
('act', 'conv', 'norm') order; BN uses frozen running-stats semantics
like the rest of this framework's detection norms.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..builder import NECKS


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


class _TransConv(nn.Module):
    """'conv' / 'interpolation_conv' transition in
    ('act', 'conv', 'norm') order (reference fpg.py:25,141)."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    upsample: bool = False
    with_norm: bool = True
    with_act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_act:
            x = nn.relu(x)
        if self.upsample:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), 'nearest')
        p = (self.kernel_size - 1) // 2
        x = nn.Conv(self.out_channels, (self.kernel_size,) * 2,
                    strides=self.stride, padding=[(p, p)] * 2,
                    use_bias=not self.with_norm, dtype=self.dtype,
                    name='conv')(x)
        if self.with_norm:
            x = _bn('bn')(x).astype(self.dtype)
        return x


@NECKS.register_module()
class FPG(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 9
    paths: Sequence[str] = ('bu',) * 9
    inter_channels: Any = None
    same_down_trans: Optional[dict] = None
    same_up_trans: Optional[dict] = None
    across_lateral_trans: Optional[dict] = None
    across_down_trans: Optional[dict] = None
    across_up_trans: Optional[dict] = None
    across_skip_trans: Optional[dict] = None
    output_trans: Optional[dict] = None
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: bool = False
    norm_cfg: Optional[dict] = None
    skip_inds: Any = None
    dtype: Any = jnp.float32

    def _trans(self, cfg, out_ch, name):
        if cfg is None:
            return None
        t = cfg.get('type', 'conv')
        if t == 'identity':
            return lambda x: x
        return _TransConv(
            out_ch, kernel_size=cfg.get('kernel_size', 3),
            stride=cfg.get('stride', 1),
            upsample=(t == 'interpolation_conv'),
            with_norm=cfg.get('norm_cfg', self.norm_cfg) is not None,
            dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        n = self.num_outs
        inter = (self.out_channels if self.inter_channels is None
                 else self.inter_channels)
        skip_inds = self.skip_inds or [()] * n

        feats = []
        for i in range(self.start_level, len(self.in_channels)):
            feats.append(nn.Conv(
                inter, (1, 1), dtype=self.dtype,
                name=f'lateral_convs{i - self.start_level}')(inputs[i]))
        while len(feats) < n:
            if self.add_extra_convs:
                feats.append(nn.Conv(
                    inter, (3, 3), strides=2, padding=[(1, 1)] * 2,
                    dtype=self.dtype,
                    name=f'extra_downsamples{len(feats)}')(feats[-1]))
            else:
                feats.append(nn.max_pool(feats[-1], (1, 1),
                                         strides=(2, 2)))

        outs = [feats]
        for s in range(self.stack_times):
            current = outs[-1]
            nxt = []
            direction = self.paths[s]
            for j in range(n):
                if s in skip_inds[j]:
                    nxt.append(current[j])
                    continue
                lvl = n - j - 1 if direction == 'td' else j
                pre = f'fpn_transitions{s}.{lvl}'
                to_fuse = []
                if direction == 'td':
                    if lvl < n - 1 and self.same_down_trans is not None:
                        to_fuse.append(self._trans(
                            self.same_down_trans, inter,
                            f'{pre}.same_down')(nxt[-1]))
                else:
                    if lvl > 0 and self.same_up_trans is not None:
                        to_fuse.append(self._trans(
                            self.same_up_trans, inter,
                            f'{pre}.same_up')(nxt[-1]))
                if self.across_lateral_trans is not None:
                    to_fuse.append(self._trans(
                        self.across_lateral_trans, inter,
                        f'{pre}.across_lateral')(current[lvl]))
                if lvl > 0 and self.across_up_trans is not None:
                    to_fuse.append(self._trans(
                        self.across_up_trans, inter,
                        f'{pre}.across_up')(current[lvl - 1]))
                if lvl < n - 1 and self.across_down_trans is not None:
                    to_fuse.append(self._trans(
                        self.across_down_trans, inter,
                        f'{pre}.across_down')(current[lvl + 1]))
                if self.across_skip_trans is not None:
                    to_fuse.append(self._trans(
                        self.across_skip_trans, inter,
                        f'{pre}.across_skip')(outs[0][lvl]))
                x = to_fuse[0]
                for t in to_fuse[1:]:
                    x = x + t
                nxt.append(x)
            outs.append(nxt[::-1] if direction == 'td' else nxt)

        final = []
        for i in range(n):
            final.append(self._trans(
                self.output_trans or dict(type='conv', kernel_size=3),
                self.out_channels, f'output_transition{i}')(outs[-1][i]))
        return tuple(final)
