"""Device (lax.scan) tracker parity vs host SORT / OC-SORT lanes."""

import numpy as np
import pytest

from vbt_tpu.tracking import ocsort as ocsort_mod
from vbt_tpu.tracking import sort as sort_mod
from vbt_tpu.tracking.scan import ScanTrackerConfig, track_video

D_CAP = 8  # detection capacity per frame


def _pad_frames(frames):
    """List of (n_i, 6) det arrays -> (T, D_CAP, 6) + validity mask."""
    T = len(frames)
    dets = np.zeros((T, D_CAP, 6), np.float64)
    valid = np.zeros((T, D_CAP), bool)
    for t, f in enumerate(frames):
        n = min(len(f), D_CAP)
        dets[t, :n] = f[:n]
        valid[t, :n] = True
    return dets, valid


def _scene(n_frames=60, n_obj=2, miss=(), jitter=0.004, seed=0, dropout=0.0):
    rng = np.random.default_rng(seed)
    frames = []
    for f in range(n_frames):
        dets = []
        if f not in miss:
            for k in range(n_obj):
                if dropout and rng.uniform() < dropout:
                    continue
                x0 = 0.1 + 0.35 * k
                phase = f / n_frames + k * 0.3
                y0 = 0.3 + 0.3 * np.sin(2 * np.pi * phase)
                det = [x0, y0, x0 + 0.18, y0 + 0.15, 0.5 + 0.4 * rng.uniform(), 0]
                dets.append(det)
        dets = np.asarray(dets).reshape(-1, 6)
        if jitter and len(dets):
            dets[:, :4] += rng.normal(0, jitter, size=dets[:, :4].shape)
        frames.append(dets)
    return frames


def _host_outputs(tracker, frames):
    """Run a host tracker; returns per-frame dict {id: (box, conf)}."""
    out = []
    for dets in frames:
        rows = tracker.update(dets, [])
        out.append(
            {int(r[4]): (np.asarray(r[:4]), float(r[6])) for r in rows}
        )
    return out


def _device_outputs(cfg, frames):
    dets, valid = _pad_frames(frames)
    # The host harness calls tracker.update on every frame (including empty
    # ones), so disable the CLI's reference empty-frame skip here.
    tracks = track_video(cfg, dets, valid, skip_empty_frames=False)
    report = np.asarray(tracks.report)
    boxes = np.asarray(tracks.box)
    ids = np.asarray(tracks.track_id)
    conf = np.asarray(tracks.conf)
    out = []
    for t in range(dets.shape[0]):
        out.append(
            {
                int(ids[t, s]): (boxes[t, s], float(conf[t, s]))
                for s in range(ids.shape[1])
                if report[t, s]
            }
        )
    return out


def _compare(host, device, atol=1e-6):
    assert len(host) == len(device)
    for t, (h, d) in enumerate(zip(host, device)):
        assert sorted(h) == sorted(d), f"frame {t}: ids {sorted(h)} vs {sorted(d)}"
        for tid in h:
            np.testing.assert_allclose(
                h[tid][0], d[tid][0], atol=atol, err_msg=f"frame {t} id {tid}"
            )
            assert h[tid][1] == pytest.approx(d[tid][1], abs=atol)


def test_scan_sort_matches_host_simple():
    frames = _scene(n_frames=50, n_obj=2, seed=1)
    sort_mod.KalmanBoxTracker.count = 0
    host = _host_outputs(sort_mod.SortTracker(max_age=30, iou_threshold=0.1), frames)
    cfg = ScanTrackerConfig.sort(max_age=30, iou_threshold=0.1, max_tracks=D_CAP)
    device = _device_outputs(cfg, frames)
    _compare(host, device)


def test_scan_sort_matches_host_with_dropouts():
    frames = _scene(n_frames=80, n_obj=3, seed=2, dropout=0.15)
    sort_mod.KalmanBoxTracker.count = 0
    host = _host_outputs(sort_mod.SortTracker(max_age=5, iou_threshold=0.2), frames)
    cfg = ScanTrackerConfig.sort(max_age=5, iou_threshold=0.2, max_tracks=D_CAP)
    device = _device_outputs(cfg, frames)
    _compare(host, device)


def test_scan_ocsort_matches_host_simple():
    frames = _scene(n_frames=50, n_obj=2, seed=3)
    host = _host_outputs(
        ocsort_mod.OCSort(max_age=30, asso_func="diou", iou_threshold=0.1), frames
    )
    cfg = ScanTrackerConfig.ocsort(
        max_age=30, asso="diou", iou_threshold=0.1, max_tracks=D_CAP
    )
    device = _device_outputs(cfg, frames)
    _compare(host, device)


def test_scan_ocsort_matches_host_with_gap():
    # An 8-frame dropout exercises freeze/ORU replay and OCR recovery.
    frames = _scene(n_frames=60, n_obj=1, miss=set(range(20, 28)), seed=4)
    host = _host_outputs(
        ocsort_mod.OCSort(max_age=30, asso_func="diou", iou_threshold=0.1), frames
    )
    cfg = ScanTrackerConfig.ocsort(
        max_age=30, asso="diou", iou_threshold=0.1, max_tracks=D_CAP
    )
    device = _device_outputs(cfg, frames)
    _compare(host, device)


def test_scan_ocsort_matches_host_noisy_multiobject():
    frames = _scene(n_frames=100, n_obj=3, seed=5, dropout=0.1, jitter=0.006)
    host = _host_outputs(
        ocsort_mod.OCSort(max_age=10, asso_func="diou", iou_threshold=0.1), frames
    )
    cfg = ScanTrackerConfig.ocsort(
        max_age=10, asso="diou", iou_threshold=0.1, max_tracks=D_CAP
    )
    device = _device_outputs(cfg, frames)
    _compare(host, device)
