"""Exact linear-sum assignment on device (reference consumer:
mmdet/core/bbox/assigners/hungarian_assigner.py:127-132, which calls
scipy.optimize.linear_sum_assignment on CPU).

TPU-native design: the reference ships the cost matrix to the host and
runs scipy inside the train loop — a host sync per image per decoder
layer. Here the Jonker-Volgenant/e-maxx potential-based Hungarian runs
entirely under jit with static shapes: a `lax.scan` over rows, each row
growing an alternating tree with a `lax.while_loop` Dijkstra (every
step is a vectorized relaxation over all C columns, so the inner loop
is O(C) VPU work, O(R*C^2) total — microseconds at DETR scale
R=C=100).

Padded/invalid rows are given a constant zero cost row: a constant row
shifts every feasible assignment's total by the same amount, so the
valid sub-assignment stays optimal while shapes stay static.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = 1e30


def linear_sum_assignment(cost: jnp.ndarray,
                          row_valid: jnp.ndarray | None = None):
    """Minimum-cost perfect matching of rows onto distinct columns.

    Args:
        cost: (R, C) float matrix, R <= C.
        row_valid: optional (R,) bool; invalid rows get a constant cost
            row (their returned column is arbitrary junk — mask it).

    Returns:
        col4row: (R,) int32 — the assigned column of each row.
    """
    r_n, c_n = cost.shape
    assert r_n <= c_n, f'need rows<=cols, got {cost.shape}'
    cost = cost.astype(jnp.float32)
    if row_valid is not None:
        cost = jnp.where(row_valid[:, None], cost, 0.0)

    def add_row(carry, r):
        u, v, match = carry                      # match: col -> row (-1 free)

        # Dijkstra over reduced costs, growing the alternating tree.
        def body(s):
            minv, way, used, i0, jprev, _j1, u, v, _done = s
            cur = cost[i0] - u[i0] - v
            upd = (~used) & (cur < minv)
            minv = jnp.where(upd, cur, minv)
            way = jnp.where(upd, jprev, way)
            masked = jnp.where(used, _INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # rows on the tree: owners of used columns, plus the free row
            owner = jnp.where(used, match, r_n)  # r_n = out-of-range slot
            row_flag = jnp.zeros((r_n + 1,), bool).at[owner].set(
                True)[:r_n].at[r].set(True)
            u = u + delta * row_flag
            v = v - delta * used
            minv = minv - delta * (~used)
            done = match[j1] < 0
            used = used.at[j1].set(True)
            i0 = jnp.where(done, i0, match[j1])
            return minv, way, used, i0, j1, j1, u, v, done

        init = (jnp.full((c_n,), _INF, jnp.float32),
                jnp.full((c_n,), -1, jnp.int32),
                jnp.zeros((c_n,), bool), r, jnp.int32(-1),
                jnp.int32(-1), u, v, False)
        (_, way, _, _, _, j1, u, v, _) = jax.lax.while_loop(
            lambda s: ~s[-1], body, init)

        # augment: walk parents back to the virtual root, shifting owners
        def aug_body(s):
            match, j0 = s
            jp = way[j0]
            new_owner = jnp.where(jp < 0, r, match[jp])
            return match.at[j0].set(new_owner), jp

        match, _ = jax.lax.while_loop(lambda s: s[1] >= 0, aug_body,
                                      (match, j1))
        return (u, v, match), None

    init = (jnp.zeros((r_n,), jnp.float32), jnp.zeros((c_n,), jnp.float32),
            jnp.full((c_n,), -1, jnp.int32))
    (_, _, match), _ = jax.lax.scan(add_row, init,
                                    jnp.arange(r_n, dtype=jnp.int32))
    # invert col->row into row->col
    col4row = jnp.zeros((r_n + 1,), jnp.int32).at[
        jnp.where(match >= 0, match, r_n)].set(
        jnp.arange(c_n, dtype=jnp.int32))[:r_n]
    return col4row
