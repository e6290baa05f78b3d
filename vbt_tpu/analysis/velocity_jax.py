"""Phase segmentation as a compiled two-pass JAX program.

The reference processes each sample in a Python loop with unbounded
per-phase history (VelocityTracker.py:92-230). A literal translation would
be a terrible TPU program, so the state machine is re-derived into a
constant-state ``lax.scan``:

**Key observation** (see vbt_tpu.analysis.velocity for the semantics being
reproduced): the control-flow state — phase, direction counters, running
``max_y_diff``, and the bar-path extrema — never depends on the *accepted
phase list*, and the ROM/acceptance computations only affect which phases
are reported. That splits the algorithm into:

- **Pass 1 (lax.scan, O(1) state)**: carries the direction counters, the
  running max/min of the active bar path together with the time and
  *metric-path-length prefix* at each extremum (incremental first-occurrence
  argmax/argmin, replacing the reference's ``np.argmax`` over a growing
  list, VelocityTracker.py:184-189), the previous appended sample (for the
  path-length increment), and the running ``max_y_diff``. A phase-end event
  emits a complete candidate record — the prefix difference between the two
  extrema reproduces the reference's pairwise sum over the path
  (VelocityTracker.py:195-201) without storing it.
- **Pass 2 (vectorized)**: the acceptance gate
  ``y_diff > max_y_diff * diff_threshold`` and ``rom >= min_distance``
  (VelocityTracker.py:192-208) and the retroactive
  ``y_diff >= final_max_y_diff / 2`` filter (VelocityTracker.py:50-67, which
  is monotone in ``max_y_diff`` and therefore equivalent to one final
  filter) evaluate in parallel over all candidate events.

Because the carry is O(1) and events are self-contained, the same step
function powers both whole-video batch analysis and the chunked streaming
session in :mod:`vbt_tpu.runtime.streaming`.
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


class VelocityCarry(NamedTuple):
    phase: Array  # int32
    pos: Array  # int32
    neg: Array  # int32
    max_y_diff: Array  # float, -inf == "no phase seen yet"
    pmax_y: Array  # running path max (first occurrence) + its time/prefix
    pmax_t: Array
    pmax_prefix: Array
    pmin_y: Array
    pmin_t: Array
    pmin_prefix: Array
    prefix: Array  # running metric-path-length prefix (inclusive)
    pa_x: Array  # previous appended sample (for path-length increments)
    pa_y: Array
    pa_w: Array
    pa_h: Array
    pa_valid: Array  # bool


class EventRecord(NamedTuple):
    """One phase-end candidate (invalid slots have ``fired`` False)."""

    fired: Array  # bool
    type: Array  # int32
    time_start: Array
    time_end: Array
    y_start: Array
    y_end: Array
    rom: Array
    y_diff: Array
    max_after: Array  # running max_y_diff including this candidate


class PhaseArrays(NamedTuple):
    """Fixed-shape phase segmentation result (one slot per sample + flush)."""

    valid: Array  # bool (T+1,)
    type: Array  # int32
    time_start: Array
    time_end: Array
    y_start: Array
    y_end: Array
    rom: Array


def initial_carry(dtype=jnp.float64) -> VelocityCarry:
    f = dtype
    return VelocityCarry(
        phase=jnp.asarray(HOLD, jnp.int32),
        pos=jnp.asarray(0, jnp.int32),
        neg=jnp.asarray(0, jnp.int32),
        max_y_diff=jnp.asarray(-jnp.inf, f),
        pmax_y=jnp.asarray(-jnp.inf, f),
        pmax_t=jnp.asarray(0.0, f),
        pmax_prefix=jnp.asarray(0.0, f),
        pmin_y=jnp.asarray(jnp.inf, f),
        pmin_t=jnp.asarray(0.0, f),
        pmin_prefix=jnp.asarray(0.0, f),
        prefix=jnp.asarray(0.0, f),
        pa_x=jnp.asarray(0.0, f),
        pa_y=jnp.asarray(0.0, f),
        pa_w=jnp.asarray(1.0, f),
        pa_h=jnp.asarray(1.0, f),
        pa_valid=jnp.asarray(False),
    )


def _event_from_carry(c: VelocityCarry) -> tuple[Array, Array, Array, Array, Array, Array]:
    """(s_t, e_t, s_y, e_y, rom, y_diff) for a phase ending now."""
    is_conc = c.phase == CONCENTRIC
    s_t = jnp.where(is_conc, c.pmax_t, c.pmin_t)
    e_t = jnp.where(is_conc, c.pmin_t, c.pmax_t)
    s_y = jnp.where(is_conc, c.pmax_y, c.pmin_y)
    e_y = jnp.where(is_conc, c.pmin_y, c.pmax_y)
    s_p = jnp.where(is_conc, c.pmax_prefix, c.pmin_prefix)
    e_p = jnp.where(is_conc, c.pmin_prefix, c.pmax_prefix)
    rom = e_p - s_p
    y_diff = c.pmax_y - c.pmin_y
    return s_t, e_t, s_y, e_y, rom, y_diff


def velocity_step(
    plate_diameter, c: VelocityCarry, inp
) -> tuple[VelocityCarry, EventRecord]:
    """One sample of the reference state machine; see module docstring."""
    tv, dy, xv, yv, wv, hv = inp
    f = c.pmax_y.dtype

    def contrib_from(c):
        dx_m = jnp.abs(xv - c.pa_x) / ((wv + c.pa_w) / 2) * plate_diameter
        dy_m = jnp.abs(yv - c.pa_y) / ((hv + c.pa_h) / 2) * plate_diameter
        return jnp.where(c.pa_valid, dx_m + dy_m, jnp.asarray(0.0, f))

    def masked_append(c, mask):
        prefix = c.prefix + jnp.where(mask, contrib_from(c), jnp.asarray(0.0, f))
        new_max = mask & (yv > c.pmax_y)
        new_min = mask & (yv < c.pmin_y)
        return c._replace(
            prefix=prefix,
            pmax_y=jnp.where(new_max, yv, c.pmax_y),
            pmax_t=jnp.where(new_max, tv, c.pmax_t),
            pmax_prefix=jnp.where(new_max, prefix, c.pmax_prefix),
            pmin_y=jnp.where(new_min, yv, c.pmin_y),
            pmin_t=jnp.where(new_min, tv, c.pmin_t),
            pmin_prefix=jnp.where(new_min, prefix, c.pmin_prefix),
            pa_x=jnp.where(mask, xv, c.pa_x),
            pa_y=jnp.where(mask, yv, c.pa_y),
            pa_w=jnp.where(mask, wv, c.pa_w),
            pa_h=jnp.where(mask, hv, c.pa_h),
            pa_valid=c.pa_valid | mask,
        )

    # -- record the sample on the active bar path (VelocityTracker.py:104-106)
    c = masked_append(c, c.phase != HOLD)

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
    s_t, e_t, s_y, e_y, rom, y_diff = _event_from_carry(c)
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
    c = masked_append(c, app_n | app_p)

    carry_out = c._replace(phase=phase3, pos=pos7, neg=neg7, max_y_diff=max_after)
    event = EventRecord(
        fired=ended,
        type=etype,
        time_start=s_t,
        time_end=e_t,
        y_start=s_y,
        y_end=e_y,
        rom=rom,
        y_diff=y_diff,
        max_after=max_after,
    )
    return carry_out, event


def flush_event(c: VelocityCarry) -> tuple[VelocityCarry, EventRecord]:
    """End-of-stream flush of an open phase (VelocityTracker.py:224-230)."""
    fired = c.phase != HOLD
    s_t, e_t, s_y, e_y, rom, y_diff = _event_from_carry(c)
    max_after = jnp.where(fired & (y_diff > c.max_y_diff), y_diff, c.max_y_diff)
    event = EventRecord(
        fired=fired,
        type=c.phase,
        time_start=s_t,
        time_end=e_t,
        y_start=s_y,
        y_end=e_y,
        rom=rom,
        y_diff=y_diff,
        max_after=max_after,
    )
    return c._replace(max_y_diff=max_after), event


def finalize_events(
    events: EventRecord,
    final_max: Array,
    diff_threshold: float,
    min_distance: float,
) -> PhaseArrays:
    """Pass 2: vectorized acceptance + one-shot retroactive filter."""
    accept = (
        events.fired
        & (events.y_diff > events.max_after * diff_threshold)
        & (events.rom >= min_distance)
        & (events.y_diff >= final_max / 2)
    )
    return PhaseArrays(
        valid=accept,
        type=events.type,
        time_start=events.time_start,
        time_end=events.time_end,
        y_start=events.y_start,
        y_end=events.y_end,
        rom=events.rom,
    )


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
    init = initial_carry(f)
    xs = (time, dy, x, y, width, height)
    final, events = jax.lax.scan(
        functools.partial(velocity_step, jnp.asarray(plate_diameter, f)), init, xs
    )
    final, flush = flush_event(final)
    events = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b[None]]), events, flush
    )
    return finalize_events(events, final.max_y_diff, diff_threshold, min_distance)


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
