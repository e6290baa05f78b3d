"""Fixed-capacity multi-object tracker as a ``lax.scan`` device program.

The reference advances its tracker one frame at a time from Python
(track.py:159-199, "HOT LOOP" in SURVEY.md §3.1), crossing the host/runtime
boundary twice per frame. Here the *entire video* is one compiled scan over
the frame axis: Kalman predict/update vectorized over track slots, exact
Hungarian association (:func:`vbt_tpu.tracking.assignment.hungarian_jax`),
and masked birth/death in place of Python list mutation.

One configurable tracker covers both reference generations:

- ``ScanTrackerConfig.sort()`` — SORT semantics (IoU affinity, no momentum,
  no recovery): parity lane for the ``dfs/`` golden generation.
- ``ScanTrackerConfig.ocsort()`` — OC-SORT semantics (DIoU affinity + OCM
  momentum + OCR last-observation recovery + ORU virtual-trajectory
  re-update): parity lane for ``dfs_ocsort/``.

Fixed capacities replace dynamic structures (SURVEY.md §7 "Hard parts"):
``max_tracks`` slots with an ``alive`` mask; dead slots are recycled. Track
ids are allocated from a carried counter in detection order, matching the
host trackers' creation order, so host/device runs agree id-for-id.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vbt_tpu.tracking.assignment import hungarian_jax
from vbt_tpu.tracking.association import ASSO_FUNCS
from vbt_tpu.tracking.kalman import bbox_to_z, kf_predict, kf_update, state_bbox
from vbt_tpu.tracking.kalman import initial_covariance, DIM_X

INVALID_COST = 1e4


class ScanTrackerConfig(NamedTuple):
    max_tracks: int = 16
    max_age: int = 30
    min_hits: int = 3
    iou_threshold: float = 0.3
    asso: str = "iou"
    inertia: float = 0.2
    delta_t: int = 3
    use_momentum: bool = False  # OCM
    use_recovery: bool = False  # OCR
    use_reupdate: bool = False  # ORU
    report_observation: bool = False  # OC-SORT reports last obs, SORT the KF state

    @classmethod
    # min_hits=1 in both factories: pinned by golden replay against the real
    # reference outputs (tests/test_tracker_golden_replay.py).
    def sort(cls, max_age=1, min_hits=1, iou_threshold=0.3, max_tracks=16):
        return cls(
            max_tracks=max_tracks,
            max_age=max_age,
            min_hits=min_hits,
            iou_threshold=iou_threshold,
            asso="iou",
        )

    @classmethod
    def ocsort(
        cls,
        max_age=30,
        min_hits=1,
        iou_threshold=0.3,
        asso="iou",
        inertia=0.2,
        delta_t=3,
        max_tracks=16,
    ):
        return cls(
            max_tracks=max_tracks,
            max_age=max_age,
            min_hits=min_hits,
            iou_threshold=iou_threshold,
            asso=asso,
            inertia=inertia,
            delta_t=delta_t,
            use_momentum=True,
            use_recovery=True,
            use_reupdate=True,
            report_observation=True,
        )


class TrackerState(NamedTuple):
    x: jnp.ndarray  # (S, 7) Kalman mean
    p: jnp.ndarray  # (S, 7, 7) Kalman covariance
    alive: jnp.ndarray  # (S,) bool
    tsu: jnp.ndarray  # (S,) int32 time_since_update
    hits: jnp.ndarray  # (S,) int32
    hit_streak: jnp.ndarray  # (S,) int32
    age: jnp.ndarray  # (S,) int32
    track_id: jnp.ndarray  # (S,) int32, 1-based
    conf: jnp.ndarray  # (S,)
    cls: jnp.ndarray  # (S,)
    last_obs: jnp.ndarray  # (S, 5) [x1,y1,x2,y2,score]; score<0 == none yet
    velocity: jnp.ndarray  # (S, 2) OCM unit direction (dy, dx)
    obs_ring: jnp.ndarray  # (S, delta_t, 5) observation ring buffer by age
    ring_age: jnp.ndarray  # (S, delta_t) int32 age stamps (-1 == empty)
    frozen_x: jnp.ndarray  # (S, 7) ORU rollback state
    frozen_p: jnp.ndarray  # (S, 7, 7)
    has_frozen: jnp.ndarray  # (S,) bool
    miss_gap: jnp.ndarray  # (S,) int32 coasted frames since freeze
    next_id: jnp.ndarray  # () int32
    frame: jnp.ndarray  # () int32


class FrameTracks(NamedTuple):
    """Per-frame scan output: one row per slot, ``report`` masks real rows."""

    report: jnp.ndarray  # (S,) bool
    box: jnp.ndarray  # (S, 4) [x1,y1,x2,y2]
    track_id: jnp.ndarray  # (S,) int32
    conf: jnp.ndarray  # (S,)
    cls: jnp.ndarray  # (S,)
    dxdy: jnp.ndarray  # (S, 2) Kalman center velocities (track.py:199)


def init_state(cfg: ScanTrackerConfig, dtype=jnp.float32) -> TrackerState:
    s = cfg.max_tracks
    return TrackerState(
        x=jnp.zeros((s, DIM_X), dtype),
        p=jnp.broadcast_to(
            jnp.asarray(initial_covariance(jnp), dtype), (s, DIM_X, DIM_X)
        ),
        alive=jnp.zeros((s,), bool),
        tsu=jnp.zeros((s,), jnp.int32),
        hits=jnp.zeros((s,), jnp.int32),
        hit_streak=jnp.zeros((s,), jnp.int32),
        age=jnp.zeros((s,), jnp.int32),
        track_id=jnp.zeros((s,), jnp.int32),
        conf=jnp.zeros((s,), dtype),
        cls=jnp.zeros((s,), dtype),
        last_obs=jnp.full((s, 5), -1.0, dtype),
        velocity=jnp.zeros((s, 2), dtype),
        obs_ring=jnp.full((s, cfg.delta_t, 5), -1.0, dtype),
        ring_age=jnp.full((s, cfg.delta_t), -1, jnp.int32),
        frozen_x=jnp.zeros((s, DIM_X), dtype),
        frozen_p=jnp.zeros((s, DIM_X, DIM_X), dtype),
        has_frozen=jnp.zeros((s,), bool),
        miss_gap=jnp.zeros((s,), jnp.int32),
        next_id=jnp.asarray(1, jnp.int32),
        frame=jnp.asarray(0, jnp.int32),
    )


def _masked(mask, new, old):
    """Broadcast a (S,) mask over trailing dims and select."""
    m = mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim))
    return jnp.where(m, new, old)


def _k_previous_obs(st: TrackerState, cfg: ScanTrackerConfig):
    """Per-slot reference observation delta_t..1 frames back (first found),
    falling back to the last observation — mirrors the host tracker."""
    out = st.last_obs
    # Walk dt = 1 .. delta_t so that larger dt (checked first on host) wins:
    # applying later writes for larger dt gives them priority.
    for dt in range(1, cfg.delta_t + 1):
        want_age = st.age - dt
        slot = jnp.mod(want_age, cfg.delta_t)
        stamped = jnp.take_along_axis(st.ring_age, slot[:, None], axis=1)[:, 0]
        obs = jnp.take_along_axis(
            st.obs_ring, slot[:, None, None].repeat(5, axis=2), axis=1
        )[:, 0]
        valid = (stamped == want_age) & (want_age >= 0)
        out = _masked(valid, obs, out)
    return out


def tracker_step(cfg: ScanTrackerConfig, st: TrackerState, dets, det_valid):
    """One frame: predict, associate, (recover), update, birth, report.

    ``dets``: (D, 6) rows [x1,y1,x2,y2,score,cls]; ``det_valid``: (D,) bool.
    """
    dtype = st.x.dtype
    dets = dets.astype(dtype)
    S = cfg.max_tracks
    D = dets.shape[0]
    affinity_fn = ASSO_FUNCS[cfg.asso]

    # ---- predict (host: KalmanBoxTracker.predict per live track) ----------
    x_pred, p_pred = kf_predict(st.x, st.p, jnp)
    st = st._replace(
        x=_masked(st.alive, x_pred, st.x),
        p=_masked(st.alive, p_pred, st.p),
        age=jnp.where(st.alive, st.age + 1, st.age),
        hit_streak=jnp.where(st.alive & (st.tsu > 0), 0, st.hit_streak),
        tsu=jnp.where(st.alive, st.tsu + 1, st.tsu),
        frame=st.frame + 1,
    )
    trk_boxes = state_bbox(st.x, jnp)

    # ---- association cost ---------------------------------------------------
    pair_valid = det_valid[:, None] & st.alive[None, :]
    affinity = affinity_fn(dets[:, :4], trk_boxes, jnp)
    affinity = jnp.where(pair_valid, affinity, -1.0)

    cost = -affinity
    if cfg.use_momentum:
        from vbt_tpu.tracking.association import direction_consistency

        k_obs = _k_previous_obs(st, cfg)
        momentum = direction_consistency(dets[:, :4], k_obs, st.velocity, jnp)
        cost = cost - cfg.inertia * jnp.where(pair_valid, momentum, 0.0)
    cost = jnp.where(pair_valid, cost, INVALID_COST)

    n = max(D, S)
    square = jnp.full((n, n), INVALID_COST, dtype=jnp.float32)
    square = square.at[:D, :S].set(cost.astype(jnp.float32))

    col_of_row = hungarian_jax(square)  # det row -> slot col
    hung_slot = jnp.where(col_of_row[:D] < S, col_of_row[:D], -1)

    # SORT shortcut: if the thresholded affinity matrix is already a partial
    # permutation, take it directly (sort.py associate_iou; same behaviour in
    # the host OC-SORT lane).
    over = (affinity > cfg.iou_threshold) & pair_valid
    is_perm = (over.sum(1) <= 1).all() & (over.sum(0) <= 1).all()
    shortcut_slot = jnp.where(over.any(axis=1), jnp.argmax(over, axis=1), -1)
    cand_slot = jnp.where(is_perm, shortcut_slot, hung_slot)

    gathered_aff = jnp.take_along_axis(
        affinity, jnp.maximum(cand_slot, 0)[:, None], axis=1
    )[:, 0]
    det_matched = (cand_slot >= 0) & (gathered_aff >= cfg.iou_threshold) & det_valid
    match_slot = jnp.where(det_matched, cand_slot, -1)

    # ---- OCR: second association round by last observation ------------------
    if cfg.use_recovery:
        slot_matched_now = jnp.zeros((S,), bool).at[jnp.maximum(match_slot, 0)].max(
            det_matched
        )
        left_det = det_valid & ~det_matched
        left_trk = st.alive & ~slot_matched_now & (st.last_obs[:, 4] >= 0)
        pair2 = left_det[:, None] & left_trk[None, :]
        aff2 = affinity_fn(dets[:, :4], st.last_obs[:, :4], jnp)
        aff2 = jnp.where(pair2, aff2, -1.0)
        do_ocr = aff2.max() > cfg.iou_threshold
        square2 = jnp.full((n, n), INVALID_COST, jnp.float32)
        square2 = square2.at[:D, :S].set(jnp.where(pair2, -aff2, INVALID_COST).astype(jnp.float32))
        col2 = hungarian_jax(square2)
        slot2 = jnp.where(col2[:D] < S, col2[:D], -1)
        aff2_g = jnp.take_along_axis(aff2, jnp.maximum(slot2, 0)[:, None], axis=1)[:, 0]
        det_matched2 = (
            do_ocr & (slot2 >= 0) & (aff2_g >= cfg.iou_threshold) & left_det
        )
        match_slot = jnp.where(det_matched2, slot2, match_slot)
        det_matched = det_matched | det_matched2

    # ---- gather per-slot match info -----------------------------------------
    # slot_det[s] = index of the detection matched to slot s (or -1).
    # Unmatched det rows scatter to index S, which mode="drop" discards.
    slot_det = jnp.full((S,), -1, jnp.int32)
    slot_det = slot_det.at[jnp.where(det_matched, match_slot, S)].set(
        jnp.arange(D, dtype=jnp.int32), mode="drop"
    )
    slot_matched = slot_det >= 0
    det_for_slot = dets[jnp.maximum(slot_det, 0)]  # (S, 6)

    # ---- ORU: rollback + virtual trajectory replay ---------------------------
    # Semantics pinned numerically to the real OC-SORT via golden-df replay
    # (see ocsort.py KalmanBoxTracker._reupdate): from the frozen post-predict
    # state of the first missed frame, run update-then-predict cycles with
    # virtual observations interpolated linearly in MEASUREMENT space
    # (center x, y, width, height); the final virtual equals the real
    # observation and CONSUMES it — replayed slots skip the regular
    # measurement update below.
    oru = jnp.zeros((S,), bool)
    if cfg.use_reupdate:
        oru = slot_matched & st.has_frozen & (st.tsu > 1) & (st.last_obs[:, 4] >= 0)
        x_r = jnp.where(oru[:, None], st.frozen_x, st.x)
        p_r = _masked(oru, st.frozen_p, st.p)
        z1 = bbox_to_z(st.last_obs[:, :4], jnp)  # (S, 4) [x, y, s, r]
        z2 = bbox_to_z(det_for_slot[:, :4], jnp)
        w1 = jnp.sqrt(z1[:, 2] * z1[:, 3])
        h1 = jnp.sqrt(z1[:, 2] / z1[:, 3])
        w2 = jnp.sqrt(z2[:, 2] * z2[:, 3])
        h2 = jnp.sqrt(z2[:, 2] / z2[:, 3])
        gap = (st.miss_gap + 1).astype(dtype)

        def replay(k, carry):
            x_r, p_r = carry
            active = oru & (k <= st.miss_gap + 1)
            frac = k.astype(dtype) / gap  # (S,)
            w = w1 + frac * (w2 - w1)
            h = h1 + frac * (h2 - h1)
            virtual_z = jnp.stack(
                [
                    z1[:, 0] + frac * (z2[:, 0] - z1[:, 0]),
                    z1[:, 1] + frac * (z2[:, 1] - z1[:, 1]),
                    w * h,
                    w / h,
                ],
                axis=-1,
            )
            xu, pu = kf_update(x_r, p_r, virtual_z, jnp)
            xp, pp_ = kf_predict(xu, pu, jnp)
            not_last = (k < st.miss_gap + 1)[:, None]
            xk = jnp.where(not_last, xp, xu)
            pk = jnp.where(not_last[:, :, None], pp_, pu)
            return _masked(active, xk, x_r), _masked(active, pk, p_r)

        x_r, p_r = jax.lax.fori_loop(1, cfg.max_age + 2, replay, (x_r, p_r))
        st = st._replace(
            x=_masked(oru, x_r, st.x), p=_masked(oru, p_r, st.p)
        )

    # ---- OCM velocity + observation bookkeeping ------------------------------
    if cfg.use_momentum:
        prev = _k_previous_obs(st, cfg)  # falls back to last_obs
        had_obs = st.last_obs[:, 4] >= 0
        from vbt_tpu.tracking.association import speed_direction

        vel_new = speed_direction(prev[:, :4], det_for_slot[:, :4], jnp)
        st = st._replace(
            velocity=_masked(slot_matched & had_obs, vel_new, st.velocity)
        )

    new_obs = jnp.concatenate(
        [det_for_slot[:, :4], det_for_slot[:, 4:5]], axis=-1
    )
    ring_slot = jnp.mod(st.age, cfg.delta_t)
    obs_ring = jnp.where(
        slot_matched[:, None, None]
        & (jnp.arange(cfg.delta_t)[None, :, None] == ring_slot[:, None, None]),
        new_obs[:, None, :],
        st.obs_ring,
    )
    ring_age = jnp.where(
        slot_matched[:, None]
        & (jnp.arange(cfg.delta_t)[None, :] == ring_slot[:, None]),
        st.age[:, None],
        st.ring_age,
    )

    # ---- measurement update (ORU-replayed slots already consumed it) -----------
    x_u, p_u = kf_update(st.x, st.p, bbox_to_z(det_for_slot[:, :4], jnp), jnp)
    st = st._replace(
        x=_masked(slot_matched & ~oru, x_u, st.x),
        p=_masked(slot_matched & ~oru, p_u, st.p),
        tsu=jnp.where(slot_matched, 0, st.tsu),
        hits=jnp.where(slot_matched, st.hits + 1, st.hits),
        hit_streak=jnp.where(slot_matched, st.hit_streak + 1, st.hit_streak),
        conf=jnp.where(slot_matched, det_for_slot[:, 4], st.conf),
        cls=jnp.where(slot_matched, det_for_slot[:, 5], st.cls),
        last_obs=_masked(slot_matched, new_obs, st.last_obs),
        obs_ring=obs_ring,
        ring_age=ring_age,
        has_frozen=jnp.where(slot_matched, False, st.has_frozen),
        miss_gap=jnp.where(slot_matched, 0, st.miss_gap),
    )

    # ---- misses: freeze for ORU ---------------------------------------------
    missed = st.alive & ~slot_matched
    if cfg.use_reupdate:
        freeze_now = missed & ~st.has_frozen
        st = st._replace(
            frozen_x=_masked(freeze_now, st.x, st.frozen_x),
            frozen_p=_masked(freeze_now, st.p, st.frozen_p),
            has_frozen=st.has_frozen | freeze_now,
            miss_gap=jnp.where(missed, st.miss_gap + 1, st.miss_gap),
        )

    # ---- births ---------------------------------------------------------------
    new_det = det_valid & ~det_matched
    det_rank = jnp.cumsum(new_det.astype(jnp.int32)) - 1  # (D,)
    free = ~st.alive
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # (S,)
    num_free = free.sum()
    # slot_of_rank[r] = index of the r-th free slot
    slot_of_rank = jnp.zeros((S,), jnp.int32).at[
        jnp.where(free, free_rank, S - 1)
    ].set(jnp.arange(S, dtype=jnp.int32), mode="drop")
    birth_ok = new_det & (det_rank < num_free)
    birth_slot = slot_of_rank[jnp.minimum(det_rank, S - 1)]  # (D,)

    # Scatter birth data det -> slot (non-births target index S -> dropped).
    slot_birth_det = jnp.full((S,), -1, jnp.int32)
    slot_birth_det = slot_birth_det.at[jnp.where(birth_ok, birth_slot, S)].set(
        jnp.arange(D, dtype=jnp.int32), mode="drop"
    )
    is_birth = slot_birth_det >= 0
    bdet = dets[jnp.maximum(slot_birth_det, 0)]
    bz = bbox_to_z(bdet[:, :4], jnp)
    bx = jnp.concatenate([bz, jnp.zeros((S, 3), dtype)], axis=-1)
    # Ids in detection order, continuing the running counter.
    birth_rank = det_rank[jnp.maximum(slot_birth_det, 0)]
    bids = st.next_id + jnp.where(is_birth, birth_rank, 0)

    st = st._replace(
        x=_masked(is_birth, bx, st.x),
        p=_masked(
            is_birth,
            jnp.broadcast_to(
                jnp.asarray(initial_covariance(jnp), dtype), (S, DIM_X, DIM_X)
            ),
            st.p,
        ),
        alive=st.alive | is_birth,
        tsu=jnp.where(is_birth, 0, st.tsu),
        hits=jnp.where(is_birth, 0, st.hits),
        hit_streak=jnp.where(is_birth, 0, st.hit_streak),
        age=jnp.where(is_birth, 0, st.age),
        track_id=jnp.where(is_birth, bids, st.track_id),
        conf=jnp.where(is_birth, bdet[:, 4], st.conf),
        cls=jnp.where(is_birth, bdet[:, 5], st.cls),
        last_obs=_masked(is_birth, jnp.full((S, 5), -1.0, dtype), st.last_obs),
        velocity=_masked(is_birth, jnp.zeros((S, 2), dtype), st.velocity),
        obs_ring=_masked(is_birth, jnp.full((S, cfg.delta_t, 5), -1.0, dtype), st.obs_ring),
        ring_age=_masked(is_birth, jnp.full((S, cfg.delta_t), -1, jnp.int32), st.ring_age),
        has_frozen=jnp.where(is_birth, False, st.has_frozen),
        miss_gap=jnp.where(is_birth, 0, st.miss_gap),
        next_id=st.next_id + new_det.sum().astype(jnp.int32),
    )

    # Host trackers record the birth observation too (update happens in
    # __init__ via the initial state; last_observation stays unset for SORT,
    # but OC-SORT's first update() sets it) — on device the first real
    # *update* sets last_obs, matching the host OC-SORT where __init__ does
    # not populate last_observation.

    # ---- report ---------------------------------------------------------------
    report = st.alive & (st.tsu < 1) & (
        (st.hit_streak >= cfg.min_hits) | (st.frame <= cfg.min_hits)
    )
    if cfg.report_observation:
        has_obs = st.last_obs[:, 4] >= 0
        box = jnp.where(has_obs[:, None], st.last_obs[:, :4], state_bbox(st.x, jnp))
    else:
        box = state_bbox(st.x, jnp)

    out = FrameTracks(
        report=report,
        box=box,
        track_id=st.track_id,
        conf=st.conf,
        cls=st.cls,
        dxdy=st.x[:, 4:6],
    )

    # ---- deaths ---------------------------------------------------------------
    st = st._replace(alive=st.alive & (st.tsu <= cfg.max_age))
    return st, out


def make_scan_step(cfg: ScanTrackerConfig, skip_empty_frames: bool):
    """The per-frame scan step, with the reference's empty-frame skip
    (track.py:180-181: ``tracker.update`` is never called on frames without
    detections, so tracks neither predict nor age there). Single source of
    truth shared by track_video, the streaming chunk scan, and the
    time-sharded relay — their equality contracts depend on it.
    """

    def step(st, inp):
        d, v = inp
        new_st, out = tracker_step(cfg, st, d, v)
        if skip_empty_frames:
            active = v.any()
            new_st = jax.tree.map(
                lambda a, b: jnp.where(active, a, b), new_st, st
            )
            out = out._replace(report=out.report & active)
        return new_st, out

    return step


@functools.partial(jax.jit, static_argnames=("cfg", "skip_empty_frames"))
def track_video(cfg: ScanTrackerConfig, dets, det_valid, skip_empty_frames=True):
    """Track a whole video in one compiled scan.

    ``dets``: (T, D, 6); ``det_valid``: (T, D) -> FrameTracks stacked over T.

    With ``skip_empty_frames`` (the reference behaviour, track.py:180-181:
    ``tracker.update`` is never called on frames without detections, so
    tracks neither predict nor age on those frames), a frame whose mask is
    all-False leaves the tracker state untouched and reports nothing.
    """
    st = init_state(cfg, dtype=dets.dtype)
    _, out = jax.lax.scan(
        make_scan_step(cfg, skip_empty_frames), st, (dets, det_valid)
    )
    return out
