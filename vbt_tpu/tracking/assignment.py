"""Exact linear assignment: host (scipy) and jittable device implementations.

The reference's trackers rely on Hungarian matching inside their pip
dependencies (and eval.py:143 uses scipy's ``linear_sum_assignment``
directly). The device tracker needs the same optimum *inside* a compiled
program, so :func:`hungarian_jax` implements the Jonker-Volgenant style
shortest-augmenting-path algorithm (O(n^3)) with ``lax`` control flow over
static shapes — assignment problems in tracking are tiny (<= max track
slots), so this is negligible compute per frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1e9


def linear_assignment(cost: np.ndarray) -> np.ndarray:
    """Host minimization assignment; returns (K, 2) array of (row, col),
    sorted by row.

    Uses the native C++ Jonker-Volgenant solver
    (vbt_tpu/native/csrc/hostops.cpp) when built — the same algorithm as the
    device-lane :func:`hungarian_jax` — falling back to scipy (the backend
    the reference uses at eval.py:143).
    """
    cost = np.asarray(cost, np.float64)
    try:
        from vbt_tpu.native import hostops
    except Exception:  # pragma: no cover
        hostops = None
    if hostops is not None:
        n, m = cost.shape
        if n <= m:
            cols = hostops.jv_assign(cost)
            return np.stack([np.arange(n), cols], axis=1)
        rows = hostops.jv_assign(np.ascontiguousarray(cost.T))
        pairs = np.stack([rows, np.arange(m)], axis=1)
        return pairs[np.argsort(pairs[:, 0], kind="stable")]

    import scipy.optimize

    rows, cols = scipy.optimize.linear_sum_assignment(cost)
    return np.stack([rows, cols], axis=1)


def hungarian_jax(cost: jnp.ndarray) -> jnp.ndarray:
    """Minimizing assignment on a square (n, n) cost matrix, jittable.

    Returns ``col_of_row``: int32 (n,) mapping each row to its column.
    Shortest-augmenting-path with row/column potentials (the classical
    O(n^3) scheme): rows are inserted one at a time; each insertion runs a
    Dijkstra over reduced costs from a virtual column (index n) until it
    reaches a free column, then augments along the predecessor chain.
    """
    cost = jnp.asarray(cost, jnp.float32)
    n = cost.shape[0]
    inf = jnp.asarray(jnp.inf, jnp.float32)

    def assign_row(i, state):
        u, v, row_of_col = state  # u (n,), v (n,), row_of_col (n+1,)
        row_of_col = row_of_col.at[n].set(i)  # virtual column holds row i

        minv = jnp.full((n,), inf)
        way = jnp.full((n,), n, jnp.int32)  # predecessor column of column j
        used = jnp.zeros((n + 1,), bool)

        def dijkstra_body(s):
            minv, way, used, j0, u, v = s
            used = used.at[j0].set(True)
            i0 = row_of_col[j0]
            cur = cost[i0] - u[i0] - v
            better = (~used[:n]) & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used[:n], inf, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # Potential update: every used column's owner row gains delta,
            # every used column loses delta, unreached columns shrink minv.
            owners = jnp.where(used[:n], row_of_col[:n], -1)
            u = jnp.where(jnp.isin(jnp.arange(n), owners), u + delta, u)
            u = u.at[i].add(jnp.where(used[n], delta, 0.0))
            v = jnp.where(used[:n], v - delta, v)
            minv = jnp.where(~used[:n], minv - delta, minv)
            return minv, way, used, j1, u, v

        init = (minv, way, used, jnp.asarray(n, jnp.int32), u, v)
        minv, way, used, j0, u, v = jax.lax.while_loop(
            lambda s: row_of_col[s[3]] != -1, dijkstra_body, init
        )

        # Augment: walk the predecessor chain back to the virtual column.
        def aug_body(s):
            j0, roc = s
            j1 = way[j0]
            roc = roc.at[j0].set(roc[j1])
            return j1, roc

        _, row_of_col = jax.lax.while_loop(
            lambda s: s[0] != n, aug_body, (j0, row_of_col)
        )
        row_of_col = row_of_col.at[n].set(-1)
        return u, v, row_of_col

    u0 = jnp.zeros((n,), jnp.float32)
    v0 = jnp.zeros((n,), jnp.float32)
    row_of_col0 = jnp.full((n + 1,), -1, jnp.int32)
    _, _, row_of_col = jax.lax.fori_loop(0, n, assign_row, (u0, v0, row_of_col0))

    col_of_row = jnp.zeros((n,), jnp.int32)
    cols = jnp.arange(n, dtype=jnp.int32)
    col_of_row = col_of_row.at[row_of_col[:n]].set(cols)
    return col_of_row
