"""Vectorized smoothing primitives matching the reference's pandas semantics.

The reference smooths with pandas in three places:

- plot.py:90-92  — ``rolling(window=5, min_periods=1).mean()`` on x,y,dx,dy
- plot.py:94-95 / kinovea.py:103-104 — ``expanding(min_periods=1).mean()`` on
  the plate dimensions
- qualysis.py:114-117 — ``rolling(window=30, min_periods=1).mean()`` on the
  plate dimensions

and the VelocityTracker smooths plate dimensions with a 30-sample running
average whose single shared instance sees widths and heights *interleaved*
(VelocityTracker.py:44-45, 98-99 — the "shared RunningAverage" quirk,
SURVEY.md §2.1 quirk 1). All of these are trailing-window means, which we
express as cumulative-sum differences so they vectorize onto the VPU instead
of running as per-sample Python.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def rolling_mean(x: Array, window: int) -> Array:
    """Trailing rolling mean with min_periods=1 (pandas ``rolling(w).mean()``).

    out[i] = mean(x[max(0, i-window+1) : i+1])

    Implemented as a sum of statically shifted copies rather than a cumsum
    difference: cumulative sums over thousands of samples lose precision in
    float32 on TPU, while the shifted-stack keeps the error at ~window * eps.
    """
    x = jnp.asarray(x)
    n = x.shape[0]
    padded = jnp.concatenate([jnp.zeros((window - 1,), x.dtype), x])
    shifted = jnp.stack([padded[k : k + n] for k in range(window)])
    counts = jnp.minimum(jnp.arange(1, n + 1), window).astype(x.dtype)
    return jnp.sum(shifted, axis=0) / counts


def expanding_mean(x: Array) -> Array:
    """Expanding mean with min_periods=1 (pandas ``expanding().mean()``)."""
    x = jnp.asarray(x)
    n = x.shape[0]
    counts = jnp.arange(1, n + 1, dtype=x.dtype)
    return jnp.cumsum(x) / counts


def running_average_np(x: np.ndarray, window: int) -> np.ndarray:
    """Exact sliding-total running average (host lane).

    Reproduces the reference RunningAverage algorithm bit-for-bit
    (RunningAverage.py:15-27): a running ``total`` accumulates adds and
    subtracts in stream order, so the float rounding differs slightly from a
    cumsum formulation. Used for parity oracles; the device path uses
    :func:`rolling_mean`.
    """
    out = np.empty_like(x, dtype=np.float64)
    buf = np.empty(window, dtype=np.float64)
    total = 0.0
    count = 0
    head = 0
    for i, v in enumerate(np.asarray(x, dtype=np.float64)):
        buf[(head + count) % window] = v
        total += v
        count += 1
        if count >= window:
            out[i] = total / window
            total -= buf[head]
            head = (head + 1) % window
            count -= 1
        else:
            out[i] = total / count
    return out


def shared_plate_average_np(
    widths: np.ndarray, heights: np.ndarray, window: int = 30
) -> tuple[np.ndarray, np.ndarray]:
    """Width/height running averages through one shared window (host lane).

    The reference VelocityTracker pushes width then height through the *same*
    30-sample RunningAverage instance each step (VelocityTracker.py:98-99),
    so each output is a mean over the interleaved [w0,h0,w1,h1,...] stream.
    """
    inter = np.empty(2 * len(widths), dtype=np.float64)
    inter[0::2] = widths
    inter[1::2] = heights
    smoothed = running_average_np(inter, window)
    return smoothed[0::2], smoothed[1::2]


def shared_plate_average(
    widths: Array, heights: Array, window: int = 30
) -> tuple[Array, Array]:
    """Vectorized version of :func:`shared_plate_average_np` (device lane)."""
    widths = jnp.asarray(widths)
    heights = jnp.asarray(heights)
    inter = jnp.stack([widths, heights], axis=1).reshape(-1)
    smoothed = rolling_mean(inter, window)
    return smoothed[0::2], smoothed[1::2]
