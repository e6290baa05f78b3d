"""Streaming real-time pipeline: chunked decode -> detect -> track -> phase.

BASELINE.json config 5: the whole per-frame loop of the reference
(track.py:159-246 plus the offline plot.py analysis) as an online session.
Device state (tracker slots, velocity-scan carry) persists across chunks, so
arbitrarily long sets stream with O(1) memory; every chunk is one tracker
scan + one velocity scan on device (the same compiled step functions as the
batch path, which is what makes streaming results *identical* to offline
analysis).

The causal smoothing (rolling-5 windows, expanding sums, the shared
30-sample plate window — plot.py:90-95 / VelocityTracker.py:44-45
semantics) runs fused with the phase state machine in the same device scan
(:mod:`vbt_tpu.analysis.smoother_scan`); the host keeps no per-sample
loops. ``_CausalSmoother`` remains as the float64 host oracle for tests.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from vbt_tpu.analysis.phase import Phase
from vbt_tpu.analysis.velocity_jax import (
    EventRecord,
    VelocityCarry,
    finalize_events,
    flush_event,
    initial_carry,
    to_phase_list,
    velocity_step,
)
from vbt_tpu.tracking.scan import (
    ScanTrackerConfig,
    TrackerState,
    init_state,
    make_scan_step,
)


@functools.partial(jax.jit, static_argnames=("cfg", "skip_empty_frames"))
def track_chunk(
    cfg: ScanTrackerConfig,
    state: TrackerState,
    dets: jnp.ndarray,
    valid: jnp.ndarray,
    skip_empty_frames: bool = True,
):
    """Advance the tracker over one chunk of frames, carrying state."""
    return jax.lax.scan(
        make_scan_step(cfg, skip_empty_frames), state, (dets, valid)
    )


@functools.partial(jax.jit, static_argnames=())
def velocity_chunk(plate_diameter, carry: VelocityCarry, inputs):
    """Advance the phase state machine over one chunk of samples."""
    return jax.lax.scan(
        functools.partial(velocity_step, plate_diameter), carry, inputs
    )


@jax.jit
def analysis_chunk(plate_diameter, smoother, carry: VelocityCarry, inputs):
    """Smoothing + phase state machine fused in ONE device scan.

    ``inputs`` = (time, x, y, dy_raw, nph, npw) arrays of one chunk.
    """
    from vbt_tpu.analysis.smoother_scan import smoother_step

    def step(state, inp):
        sm, vc = state
        t, x, y, dy, nph, npw = inp
        sm, (x_s, y_s, dy_eff, w_ra, h_ra) = smoother_step(
            sm, (x, y, dy, nph, npw)
        )
        vc, ev = velocity_step(
            plate_diameter, vc, (t, dy_eff, x_s, y_s, w_ra, h_ra)
        )
        return (sm, vc), ev

    (sm, vc), events = jax.lax.scan(step, (smoother, carry), inputs)
    return sm, vc, events


class _CausalSmoother:
    """Exact causal replication of the plot.py/VelocityTracker smoothing."""

    def __init__(self):
        self.win_x: list[float] = []
        self.win_y: list[float] = []
        self.exp_h_sum = 0.0
        self.exp_w_sum = 0.0
        self.exp_n = 0
        self.ra_buf: list[float] = []  # shared interleaved width/height window
        self.ra_total = 0.0
        self.y_prev: float | None = None

    def _ra_update(self, value: float) -> float:
        self.ra_buf.append(value)
        self.ra_total += value
        if len(self.ra_buf) >= 30:
            out = self.ra_total / 30
            self.ra_total -= self.ra_buf.pop(0)
            return out
        return self.ra_total / len(self.ra_buf)

    def push(self, x, y, dy_raw, nph, npw):
        """Returns (x_s, y_s, dy_eff, w_ra, h_ra) for one raw sample."""
        self.win_x.append(x)
        self.win_y.append(y)
        if len(self.win_x) > 5:
            self.win_x.pop(0)
            self.win_y.pop(0)
        x_s = sum(self.win_x) / len(self.win_x)
        y_s = sum(self.win_y) / len(self.win_y)

        self.exp_h_sum += nph
        self.exp_w_sum += npw
        self.exp_n += 1
        h_e = self.exp_h_sum / self.exp_n
        w_e = self.exp_w_sum / self.exp_n

        w_ra = self._ra_update(w_e)
        h_ra = self._ra_update(h_e)

        dy_eff = dy_raw if self.y_prev is None else y_s - self.y_prev
        self.y_prev = y_s
        return x_s, y_s, dy_eff, w_ra, h_ra


@dataclass
class StreamingAnalyzer:
    """Measurement-level streaming phase analysis (one followed track).

    Feed raw (time, x, y, dy, norm_plate_height, norm_plate_width) samples in
    chunks; read ``phases()`` at any point for the current segmentation —
    identical to running the offline ``analyze_series`` on everything seen
    so far.
    """

    plate_diameter: float = 0.45
    diff_threshold: float = 0.6
    min_distance: float = 0.1
    dtype: object = jnp.float64

    _carry: VelocityCarry | None = None
    _events: list = field(default_factory=list)

    def __post_init__(self):
        from vbt_tpu.analysis.smoother_scan import initial_smoother

        self._carry = initial_carry(self.dtype)
        self._smoother = initial_smoother(self.dtype)
        self._pd = jnp.asarray(self.plate_diameter, self.dtype)

    def push_chunk(self, time, x, y, dy, nph, npw) -> None:
        n = len(time)
        if n == 0:
            return
        inputs = tuple(
            jnp.asarray(np.asarray(c, np.float64), self.dtype)
            for c in (time, x, y, dy, nph, npw)
        )
        self._smoother, self._carry, events = analysis_chunk(
            self._pd, self._smoother, self._carry, inputs
        )
        fired = np.asarray(events.fired)
        if fired.any():
            host = {k: np.asarray(v) for k, v in events._asdict().items()}
            for i in np.nonzero(fired)[0]:
                self._events.append({k: host[k][i] for k in host})

    def phases(self, include_open: bool = True) -> list[Phase]:
        """Current phase list.

        ``include_open`` adds the open-phase flush preview (what
        ``end_processing`` would emit if the stream ended now) — the final
        summary wants it; live per-rep announcements pass False so only
        completed phases print (their metrics are final modulo the
        retroactive filter)."""
        carry, flush = flush_event(self._carry)
        records = list(self._events)
        flush_host = {k: np.asarray(v) for k, v in flush._asdict().items()}
        if include_open and bool(flush_host["fired"]):
            records.append(flush_host)
        if not records:
            return []
        events = EventRecord(
            **{
                k: jnp.asarray(np.stack([r[k] for r in records]))
                for k in records[0]
            }
        )
        pa = finalize_events(
            events, carry.max_y_diff, self.diff_threshold, self.min_distance
        )
        return to_phase_list(pa)


@dataclass
class StreamingPipeline:
    """Frames-in, phases-out: detect + track + analyze, chunk by chunk.

    Follows one track id (default 1 — the stable OC-SORT identity on the
    reference's clips); per-rep metrics are available live via
    ``analyzer.phases()``.
    """

    detector: object
    fps: float
    detection_threshold: float = 0.5
    plate_diameter: float = 0.45
    follow_id: int = 1
    tracker_cfg: ScanTrackerConfig = field(
        default_factory=lambda: ScanTrackerConfig.ocsort(
            max_age=30, asso="diou", iou_threshold=0.1, max_tracks=16
        )
    )

    def __post_init__(self):
        self._tracker_state = init_state(self.tracker_cfg, dtype=jnp.float64)
        self.analyzer = StreamingAnalyzer(plate_diameter=self.plate_diameter)
        self._frame_count = 0

    def process_frames(self, frames_uint8: np.ndarray) -> None:
        det = self.detector.detect_batch(frames_uint8)
        rows, valid = self.detector.detections_to_tracker_inputs(
            det, self.detection_threshold
        )
        self._tracker_state, out = track_chunk(
            self.tracker_cfg,
            self._tracker_state,
            jnp.asarray(rows, jnp.float64),
            jnp.asarray(valid),
        )
        report = np.asarray(out.report)
        boxes = np.asarray(out.box)
        ids = np.asarray(out.track_id)
        dxdy = np.asarray(out.dxdy)

        t_arr, x_arr, y_arr, dy_arr, h_arr, w_arr = [], [], [], [], [], []
        for t in range(rows.shape[0]):
            self._frame_count += 1
            for s in np.nonzero(report[t])[0]:
                if int(ids[t, s]) != self.follow_id:
                    continue
                x1, y1, x2, y2 = boxes[t, s]
                t_arr.append(self._frame_count / self.fps)
                x_arr.append((x1 + x2) / 2)
                y_arr.append((y1 + y2) / 2)
                dy_arr.append(dxdy[t, s, 1])
                h_arr.append(abs(y2 - y1))
                w_arr.append(abs(x2 - x1))
        self.analyzer.push_chunk(t_arr, x_arr, y_arr, dy_arr, h_arr, w_arr)

    def phases(self, include_open: bool = True) -> list[Phase]:
        return self.analyzer.phases(include_open=include_open)
