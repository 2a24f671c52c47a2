"""A/B the fold/unfold VJP gathers at stage-1 Swin shape (PERF.md
round-5 trace: the four chained backward gathers run 1.08 ms each vs
0.37 ms forward for identical data volume). Variants probe whether the
slowdown is index structure, gather axis, or layout."""
import os.path as osp
import sys, time
sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))
import numpy as np
import jax
import jax.numpy as jnp
from swindet_tpu.models.backbones.swin import window_gather_indices

B, H, W, C, WS = 2, 200, 336, 96, 7


def timeit(f, *args, iters=50):
    f(*args)[0].block_until_ready() if isinstance(f(*args), tuple) else \
        jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.time() - t0) / iters * 1e3


def main():
    idx, valid, inv = window_gather_indices(H, W, WS, WS // 2)
    idxj = jnp.asarray(idx)
    invj = jnp.asarray(inv)
    x = jnp.asarray(np.random.randn(B, H * W, C), jnp.bfloat16)
    g = jnp.asarray(np.random.randn(B, len(idx), C), jnp.bfloat16)

    fwd = jax.jit(lambda t: t[:, idxj, :])
    bwd = jax.jit(lambda t: t[:, invj, :])
    print(f'fwd gather idx   (B,{len(idx)},C): {timeit(fwd, x):.3f} ms')
    print(f'bwd gather inv   (B,{len(inv)},C): {timeit(bwd, g):.3f} ms')

    # variant: flatten batch into rows -> gather on axis 0 of (B*L, C)
    idx2 = (np.arange(B)[:, None] * (H * W) + idx[None, :]).reshape(-1)
    inv2 = (np.arange(B)[:, None] * len(idx) + inv[None, :]).reshape(-1)
    idx2j, inv2j = jnp.asarray(idx2), jnp.asarray(inv2)
    fwd2 = jax.jit(lambda t: jnp.take(
        t.reshape(-1, C), idx2j, axis=0).reshape(B, -1, C))
    bwd2 = jax.jit(lambda t: jnp.take(
        t.reshape(-1, C), inv2j, axis=0).reshape(B, -1, C))
    print(f'fwd flat-row gather: {timeit(fwd2, x):.3f} ms')
    print(f'bwd flat-row gather: {timeit(bwd2, g):.3f} ms')

    # variant: channels-major — gather along the last-but-one of (C-major)
    fwd3 = jax.jit(lambda t: jnp.take(t, idxj, axis=1))
    bwd3 = jax.jit(lambda t: jnp.take(t, invj, axis=1))
    print(f'fwd take axis1: {timeit(fwd3, x):.3f} ms')
    print(f'bwd take axis1: {timeit(bwd3, g):.3f} ms')

    # variant: one fused fwd+bwd chain like the real VJP pairing
    both = jax.jit(lambda t, gg: (t[:, idxj, :], gg[:, invj, :]))
    r = timeit(lambda t: both(t, g), x)
    print(f'paired fwd+bwd: {r:.3f} ms')


if __name__ == '__main__':
    main()
