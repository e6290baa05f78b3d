"""Causal smoothing as a ``lax.scan``-able device state machine.

The streaming analyzer originally replicated plot.py's smoothing
(rolling-5 mean on x/y, expanding mean on plate dims, the shared
interleaved 30-sample RunningAverage of VelocityTracker.py:44-45/98-99,
and the dy-override of VelocityTracker.py:101-102) with a per-sample host
Python loop (VERDICT r1, weak #8). The state is all fixed-size — a
5-ring, two expanding sums, and one 30-ring shared by width and height —
so it scans on device; fused with the velocity state machine the whole
streaming analysis is one compiled program per chunk.

Numerics are kept identical to the host lane (`_CausalSmoother`): the
5-window mean divides by the CURRENT element count, the shared 30-ring
emits total/30 exactly when it fills and then evicts, and width/height
pass through the SAME ring interleaved (width first), reproducing the
reference's shared-instance quirk (SURVEY.md §2.1 quirk 1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class SmootherCarry(NamedTuple):
    ring5_x: jnp.ndarray  # (5,)
    ring5_y: jnp.ndarray  # (5,)
    n5: jnp.ndarray  # () int32 — samples seen, capped at 5
    pos5: jnp.ndarray  # () int32 — next write slot
    exp_h_sum: jnp.ndarray
    exp_w_sum: jnp.ndarray
    exp_n: jnp.ndarray  # () int32
    ra_buf: jnp.ndarray  # (30,) shared width/height ring
    ra_total: jnp.ndarray
    ra_len: jnp.ndarray  # () int32 (oscillates 29<->30 once warm)
    ra_head: jnp.ndarray  # () int32 eviction pointer
    y_prev: jnp.ndarray
    has_prev: jnp.ndarray  # () bool


def initial_smoother(dtype=jnp.float64) -> SmootherCarry:
    z = jnp.asarray(0.0, dtype)
    return SmootherCarry(
        ring5_x=jnp.zeros((5,), dtype),
        ring5_y=jnp.zeros((5,), dtype),
        n5=jnp.asarray(0, jnp.int32),
        pos5=jnp.asarray(0, jnp.int32),
        exp_h_sum=z,
        exp_w_sum=z,
        exp_n=jnp.asarray(0, jnp.int32),
        ra_buf=jnp.zeros((30,), dtype),
        ra_total=z,
        ra_len=jnp.asarray(0, jnp.int32),
        ra_head=jnp.asarray(0, jnp.int32),
        y_prev=z,
        has_prev=jnp.asarray(False),
    )


def _ra_update(c: SmootherCarry, value):
    """One shared-RunningAverage push (RunningAverage.py:21-27 semantics)."""
    tail = (c.ra_head + c.ra_len) % 30
    buf = c.ra_buf.at[tail].set(value)
    total = c.ra_total + value
    length = c.ra_len + 1
    full = length >= 30
    out = jnp.where(full, total / 30.0, total / length.astype(total.dtype))
    evicted = buf[c.ra_head]
    total = jnp.where(full, total - evicted, total)
    head = jnp.where(full, (c.ra_head + 1) % 30, c.ra_head)
    length = jnp.where(full, length - 1, length)
    return (
        c._replace(ra_buf=buf, ra_total=total, ra_len=length, ra_head=head),
        out,
    )


def smoother_step(c: SmootherCarry, inp):
    """One raw sample -> (carry, (x_s, y_s, dy_eff, w_ra, h_ra)).

    ``inp`` = (x, y, dy_raw, norm_plate_height, norm_plate_width).
    """
    x, y, dy_raw, nph, npw = inp

    ring5_x = c.ring5_x.at[c.pos5].set(x)
    ring5_y = c.ring5_y.at[c.pos5].set(y)
    n5 = jnp.minimum(c.n5 + 1, 5)
    pos5 = (c.pos5 + 1) % 5
    denom = n5.astype(ring5_x.dtype)
    x_s = ring5_x.sum() / denom
    y_s = ring5_y.sum() / denom

    exp_h = c.exp_h_sum + nph
    exp_w = c.exp_w_sum + npw
    exp_n = c.exp_n + 1
    h_e = exp_h / exp_n.astype(exp_h.dtype)
    w_e = exp_w / exp_n.astype(exp_w.dtype)

    c = c._replace(
        ring5_x=ring5_x, ring5_y=ring5_y, n5=n5, pos5=pos5,
        exp_h_sum=exp_h, exp_w_sum=exp_w, exp_n=exp_n,
    )
    # Width first, then height, through the SAME ring (the shared-instance
    # quirk: VelocityTracker.py:44-45, 98-99).
    c, w_ra = _ra_update(c, w_e)
    c, h_ra = _ra_update(c, h_e)

    dy_eff = jnp.where(c.has_prev, y_s - c.y_prev, dy_raw)
    c = c._replace(y_prev=y_s, has_prev=jnp.asarray(True))
    return c, (x_s, y_s, dy_eff, w_ra, h_ra)
