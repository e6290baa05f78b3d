"""Host SORT / OC-SORT behaviour on synthetic scenes."""

import numpy as np
import pytest

from vbt_tpu.tracking import OCSort, SortTracker
from vbt_tpu.tracking.assignment import hungarian_jax, linear_assignment


def _scene(n_frames=60, miss=(), jitter=0.0, seed=0):
    """Two plates moving vertically in opposite directions, normalized coords."""
    rng = np.random.default_rng(seed)
    frames = []
    for f in range(n_frames):
        dets = []
        if f not in miss:
            y1 = 0.2 + 0.4 * (f / n_frames)
            dets.append([0.10, y1, 0.30, y1 + 0.15, 0.9, 0])
            y2 = 0.7 - 0.4 * (f / n_frames)
            dets.append([0.60, y2, 0.85, y2 + 0.15, 0.8, 0])
        dets = np.asarray(dets).reshape(-1, 6)
        if jitter and len(dets):
            dets[:, :4] += rng.normal(0, jitter, size=dets[:, :4].shape)
        frames.append(dets)
    return frames


@pytest.mark.parametrize("tracker_fn", [
    lambda: SortTracker(max_age=30, iou_threshold=0.1),
    lambda: OCSort(max_age=30, asso_func="diou", iou_threshold=0.1),
])
def test_stable_ids_two_objects(tracker_fn):
    tracker = tracker_fn()
    ids_a, ids_b = set(), set()
    for f, dets in enumerate(_scene(jitter=0.003)):
        out = tracker.update(dets, [])
        if f >= 3:
            assert out.shape[0] == 2
            # Identify outputs by x position.
            for row in out:
                (ids_a if row[0] < 0.5 else ids_b).add(int(row[4]))
    assert len(ids_a) == 1 and len(ids_b) == 1
    assert ids_a != ids_b


def test_ocsort_recovers_identity_after_gap():
    tracker = OCSort(max_age=30, asso_func="diou", iou_threshold=0.1)
    ids = []
    for dets in _scene(miss=set(range(20, 28))):
        out = tracker.update(dets, [])
        for row in out:
            if row[0] < 0.5:
                ids.append(int(row[4]))
    assert len(set(ids)) == 1  # identity survives the 8-frame dropout


def test_sort_output_format_and_kf_surface():
    tracker = SortTracker(max_age=30, iou_threshold=0.1)
    out = None
    for dets in _scene()[:5]:
        out = tracker.update(dets, [])
    assert out.shape == (2, 7)
    x1, y1, x2, y2, tid, cls, score = out[0]
    assert x2 > x1 and y2 > y1
    assert tid >= 1
    # The reference reads velocities via trk.kf.x.flatten()[4:6]
    # (track.py:194-199).
    trk = next(t for t in tracker.trackers if t.id == int(tid) - 1)
    vel = trk.kf.x.flatten()[4:6]
    assert vel.shape == (2,)
    assert np.isfinite(vel).all()


def test_ocsort_max_age_prunes():
    tracker = OCSort(max_age=5, asso_func="diou", iou_threshold=0.1)
    frames = _scene(n_frames=40, miss=set(range(10, 40)))
    for dets in frames:
        tracker.update(dets, [])
    assert len(tracker.trackers) == 0


def test_empty_update_contract():
    tracker = OCSort(max_age=30, asso_func="diou", iou_threshold=0.1)
    out = tracker.update(np.empty((0, 6)), [])
    assert out.shape == (0, 7)


def test_hungarian_host_vs_jax_rectangular_padding():
    rng = np.random.default_rng(9)
    iou = rng.uniform(0, 1, size=(3, 5)).astype(np.float32)
    # Pad to square with zeros (the tracker's device-lane convention).
    cost = np.zeros((5, 5), np.float32)
    cost[:3, :5] = -iou
    col = np.asarray(hungarian_jax(cost))
    ref = linear_assignment(cost)
    got = cost[np.arange(5), col].sum()
    want = cost[ref[:, 0], ref[:, 1]].sum()
    assert got == pytest.approx(want, abs=1e-6)
