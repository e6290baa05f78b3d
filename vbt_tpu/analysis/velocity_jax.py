"""Phase segmentation as a compiled two-pass JAX program.

The reference processes each sample in a Python loop with unbounded
per-phase history (VelocityTracker.py:92-230). A literal translation would
be a terrible TPU program, so the state machine is re-derived into a
constant-state ``lax.scan``:

**Key observation** (see vbt_tpu.analysis.velocity for the semantics being
reproduced): the control-flow state — phase, direction counters, running
``max_y_diff``, and the bar-path extrema — never depends on the *accepted
phase list*, and the ROM/acceptance computations only affect which phases are
reported. That splits the algorithm into:

- **Pass 1 (lax.scan, O(T) state)**: carries the direction counters, the
  running max/min of the active bar path (incremental first-occurrence
  argmax/argmin, replacing the reference's ``np.argmax`` over a growing list,
  VelocityTracker.py:184-189), the previous appended sample (for the metric
  path-length increment), and the running ``max_y_diff``. Emits, per step,
  the path-length *contribution* of the sample and a possible phase-end
  event ``(type, start_idx, end_idx, y_diff, max_y_diff_after)``.
- **Pass 2 (vectorized)**: a prefix sum turns contributions into per-event
  ROM (``prefix[end] - prefix[start]`` reproduces the reference's pairwise
  sum over the path, VelocityTracker.py:195-201); the acceptance gate
  ``y_diff > max_y_diff * diff_threshold`` and ``rom >= min_distance``
  (VelocityTracker.py:192-208) and the retroactive
  ``y_diff >= final_max_y_diff / 2`` filter (VelocityTracker.py:50-67, which
  is monotone in ``max_y_diff`` and therefore equivalent to one final filter)
  are evaluated in parallel over all events.

A stale contribution can linger at a step whose append was later discarded by
a bar-path reset; it is harmless because any later event's
``(start, end]`` interval begins after the reset.

The whole video therefore runs as one compiled program with O(1) scan state.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vbt_tpu.analysis.phase import CONCENTRIC, ECCENTRIC, HOLD, Phase
from vbt_tpu.analysis.smoothing import expanding_mean, rolling_mean, shared_plate_average
from vbt_tpu.analysis.velocity import END_COUNT, START_COUNT

Array = jnp.ndarray


class _Carry(NamedTuple):
    phase: Array  # int32
    pos: Array  # int32
    neg: Array  # int32
    max_y_diff: Array  # float, -inf == "no phase seen yet"
    pmax_y: Array  # running path max (first occurrence)
    pmax_i: Array
    pmin_y: Array
    pmin_i: Array
    pa_x: Array  # previous appended sample (for path-length increments)
    pa_y: Array
    pa_w: Array
    pa_h: Array
    pa_valid: Array  # bool


class PhaseArrays(NamedTuple):
    """Fixed-shape phase segmentation result (one slot per sample + flush)."""

    valid: Array  # bool (T+1,)
    type: Array  # int32
    time_start: Array
    time_end: Array
    y_start: Array
    y_end: Array
    rom: Array


def _step(plate_diameter, carry: _Carry, inp):
    t, dy, xv, yv, wv, hv = inp
    f = carry.pmax_y.dtype
    c = carry

    def contrib_from(c):
        dx_m = jnp.abs(xv - c.pa_x) / ((wv + c.pa_w) / 2) * plate_diameter
        dy_m = jnp.abs(yv - c.pa_y) / ((hv + c.pa_h) / 2) * plate_diameter
        return jnp.where(c.pa_valid, dx_m + dy_m, jnp.asarray(0.0, f))

    def appended(c):
        new_max = yv > c.pmax_y
        new_min = yv < c.pmin_y
        return c._replace(
            pmax_y=jnp.where(new_max, yv, c.pmax_y),
            pmax_i=jnp.where(new_max, t, c.pmax_i),
            pmin_y=jnp.where(new_min, yv, c.pmin_y),
            pmin_i=jnp.where(new_min, t, c.pmin_i),
            pa_x=xv,
            pa_y=yv,
            pa_w=wv,
            pa_h=hv,
            pa_valid=jnp.asarray(True),
        )

    def masked_append(c, mask):
        new = appended(c)
        contrib = jnp.where(mask, contrib_from(c), jnp.asarray(0.0, f))
        merged = jax.tree.map(lambda a, b: jnp.where(mask, b, a), c, new)
        return merged, contrib

    # -- record the sample on the active bar path (VelocityTracker.py:104-106)
    in_phase = c.phase != HOLD
    c, contrib_pre = masked_append(c, in_phase)

    # -- concentric end check (VelocityTracker.py:108-116)
    is_conc = c.phase == CONCENTRIC
    pos1 = jnp.where(is_conc, jnp.where(dy > 0, c.pos + 1, 0), c.pos)
    neg1 = jnp.where(is_conc & (dy > 0), 0, c.neg)
    conc_end = is_conc & (dy > 0) & (pos1 >= END_COUNT)

    # -- eccentric end check; note the asymmetric else branch
    #    (VelocityTracker.py:118-127)
    is_ecc = c.phase == ECCENTRIC
    neg2 = jnp.where(is_ecc, jnp.where(dy < 0, neg1 + 1, 0), neg1)
    pos2 = jnp.where(is_ecc, jnp.where(dy < 0, 0, pos1 + 1), pos1)
    ecc_end = is_ecc & (dy < 0) & (neg2 >= END_COUNT)

    ended = conc_end | ecc_end
    etype = c.phase
    s_ev = jnp.where(is_conc, c.pmax_i, c.pmin_i)
    e_ev = jnp.where(is_conc, c.pmin_i, c.pmax_i)
    y_diff = c.pmax_y - c.pmin_y  # == |y[argmax] - y[argmin]|
    max_after = jnp.where(ended & (y_diff > c.max_y_diff), y_diff, c.max_y_diff)

    phase1 = jnp.where(ended, HOLD, c.phase)
    pos3 = jnp.where(ended, 0, pos2)
    neg3 = jnp.where(ended, 0, neg2)

    # -- HOLD, negative dy: count toward a concentric start
    #    (VelocityTracker.py:129-141)
    hn = (dy < 0) & (phase1 == HOLD)
    neg4 = jnp.where(hn, neg3 + 1, neg3)
    pos4 = jnp.where(hn, 0, pos3)
    reset_n = hn & (neg4 == 1)
    app_n = hn & (neg4 != 1)
    start_c = hn & (neg4 >= START_COUNT)
    phase2 = jnp.where(start_c, CONCENTRIC, phase1)
    pos5 = jnp.where(start_c, 0, pos4)
    neg5 = jnp.where(start_c, 0, neg4)

    # -- HOLD, positive dy: count toward an eccentric start
    #    (VelocityTracker.py:143-155)
    hp = (dy > 0) & (phase2 == HOLD)
    pos6 = jnp.where(hp, pos5 + 1, pos5)
    neg6 = jnp.where(hp, 0, neg5)
    reset_p = hp & (pos6 == 1)
    app_p = hp & (pos6 != 1)
    start_e = hp & (pos6 >= START_COUNT)
    phase3 = jnp.where(start_e, ECCENTRIC, phase2)
    pos7 = jnp.where(start_e, 0, pos6)
    neg7 = jnp.where(start_e, 0, neg6)

    # -- bar-path reset drops the triggering sample (VelocityTracker.py:137)
    reset = reset_n | reset_p
    inf = jnp.asarray(jnp.inf, f)
    c = c._replace(
        pmax_y=jnp.where(reset, -inf, c.pmax_y),
        pmin_y=jnp.where(reset, inf, c.pmin_y),
        pa_valid=jnp.where(reset, False, c.pa_valid),
    )

    # -- pre-start appends while counting in HOLD (mutually exclusive with
    #    both the reset and the in-phase append above)
    c, contrib_hold = masked_append(c, app_n | app_p)

    carry_out = c._replace(phase=phase3, pos=pos7, neg=neg7, max_y_diff=max_after)
    out = (contrib_pre + contrib_hold, ended, etype, s_ev, e_ev, y_diff, max_after)
    return carry_out, out


def segment_phases(
    time: Array,
    x: Array,
    y: Array,
    dy: Array,
    width: Array,
    height: Array,
    plate_diameter: float,
    diff_threshold: float = 0.6,
    min_distance: float = 0.1,
) -> PhaseArrays:
    """Run the two-pass segmentation over pre-smoothed sample arrays.

    ``width``/``height`` must already be running-average smoothed (the shared
    30-sample window; see :func:`vbt_tpu.analysis.smoothing.shared_plate_average`).
    ``dy`` must already carry the finite-difference override
    (VelocityTracker.py:101-102) — :func:`analyze_series` does all of this.
    """
    f = jnp.result_type(y)
    time, x, y, dy, width, height = (
        jnp.asarray(a, f) for a in (time, x, y, dy, width, height)
    )
    n = y.shape[0]
    init = _Carry(
        phase=jnp.asarray(HOLD, jnp.int32),
        pos=jnp.asarray(0, jnp.int32),
        neg=jnp.asarray(0, jnp.int32),
        max_y_diff=jnp.asarray(-jnp.inf, f),
        pmax_y=jnp.asarray(-jnp.inf, f),
        pmax_i=jnp.asarray(0, jnp.int32),
        pmin_y=jnp.asarray(jnp.inf, f),
        pmin_i=jnp.asarray(0, jnp.int32),
        pa_x=jnp.asarray(0.0, f),
        pa_y=jnp.asarray(0.0, f),
        pa_w=jnp.asarray(1.0, f),
        pa_h=jnp.asarray(1.0, f),
        pa_valid=jnp.asarray(False),
    )
    xs = (jnp.arange(n, dtype=jnp.int32), dy, x, y, width, height)
    final, (contrib, ended, etype, s_ev, e_ev, y_diff, max_after) = jax.lax.scan(
        functools.partial(_step, jnp.asarray(plate_diameter, f)), init, xs
    )

    # Flush an open phase at stream end (VelocityTracker.py:224-230).
    flush = final.phase != HOLD
    f_is_conc = final.phase == CONCENTRIC
    f_s = jnp.where(f_is_conc, final.pmax_i, final.pmin_i)
    f_e = jnp.where(f_is_conc, final.pmin_i, final.pmax_i)
    f_ydiff = final.pmax_y - final.pmin_y
    f_max = jnp.where(flush & (f_ydiff > final.max_y_diff), f_ydiff, final.max_y_diff)

    ended = jnp.concatenate([ended, flush[None]])
    etype = jnp.concatenate([etype, final.phase[None]])
    s_ev = jnp.concatenate([s_ev, f_s[None]])
    e_ev = jnp.concatenate([e_ev, f_e[None]])
    y_diff = jnp.concatenate([y_diff, f_ydiff[None]])
    max_after = jnp.concatenate([max_after, f_max[None]])

    # Pass 2: vectorized ROM + acceptance over all candidate events.
    prefix = jnp.cumsum(contrib)
    rom = prefix[e_ev] - prefix[s_ev]
    final_max = f_max  # running max is monotone; last value is the global max
    accept = (
        ended
        & (y_diff > max_after * diff_threshold)
        & (rom >= min_distance)
        & (y_diff >= final_max / 2)
    )

    return PhaseArrays(
        valid=accept,
        type=etype,
        time_start=time[s_ev],
        time_end=time[e_ev],
        y_start=y[s_ev],
        y_end=y[e_ev],
        rom=rom,
    )


@functools.partial(jax.jit, static_argnames=("presmooth",))
def analyze_series(
    time: Array,
    x: Array,
    y: Array,
    dx: Array,
    dy: Array,
    norm_plate_height: Array,
    norm_plate_width: Array,
    plate_diameter: float = 0.45,
    diff_threshold: float = 0.6,
    min_distance: float = 0.1,
    presmooth: bool = True,
) -> PhaseArrays:
    """End-to-end analysis of one track's raw measurement series.

    With ``presmooth=True`` this fuses the plot.py:90-95 pandas smoothing
    (rolling-5 mean on x/y/dx/dy, expanding mean on plate dims), the shared
    running-average plate smoothing, the dy finite-difference override, and
    the two-pass phase segmentation into a single compiled program.
    """
    if presmooth:
        x = rolling_mean(x, 5)
        y = rolling_mean(y, 5)
        dx = rolling_mean(dx, 5)
        dy = rolling_mean(dy, 5)
        norm_plate_height = expanding_mean(norm_plate_height)
        norm_plate_width = expanding_mean(norm_plate_width)

    width, height = shared_plate_average(norm_plate_width, norm_plate_height)
    dy_eff = jnp.concatenate([dy[:1], jnp.diff(y)])
    return segment_phases(
        time,
        x,
        y,
        dy_eff,
        width,
        height,
        plate_diameter=plate_diameter,
        diff_threshold=diff_threshold,
        min_distance=min_distance,
    )


def to_phase_list(pa: PhaseArrays) -> list[Phase]:
    """Compact fixed-shape results into the host-side Phase list (ordered)."""
    valid = jax.device_get(pa.valid)
    fields = {k: jax.device_get(v) for k, v in pa._asdict().items()}
    out = []
    for i in range(valid.shape[0]):
        if valid[i]:
            out.append(
                Phase(
                    time_start=float(fields["time_start"][i]),
                    time_end=float(fields["time_end"][i]),
                    y_start=float(fields["y_start"][i]),
                    y_end=float(fields["y_end"][i]),
                    rom=float(fields["rom"][i]),
                    type=int(fields["type"][i]),
                )
            )
    return out
