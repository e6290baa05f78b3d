"""Cross-chip time-chunk sharding equals the single-device scan
(SURVEY.md §2.2 sequence-parallel row; VERDICT r1, next-step 6)."""

import numpy as np
import pytest

from vbt_tpu.parallel.mesh import make_mesh
from vbt_tpu.parallel.time_shard import track_video_time_sharded
from vbt_tpu.tracking.scan import ScanTrackerConfig, track_video


def _scene(n_frames=200, n_obj=2, miss=(), seed=0):
    rng = np.random.default_rng(seed)
    dets = np.zeros((n_frames, 4, 6))
    valid = np.zeros((n_frames, 4), bool)
    for f in range(n_frames):
        if f in miss:
            continue
        for k in range(n_obj):
            x0 = 0.1 + 0.35 * k
            y0 = 0.3 + 0.3 * np.sin(2 * np.pi * (f / n_frames + 0.3 * k))
            box = np.array([x0, y0, x0 + 0.18, y0 + 0.15])
            box += rng.normal(0, 0.004, 4)
            dets[f, k] = [*box, 0.5 + 0.4 * rng.uniform(), 0]
            valid[f, k] = True
    return dets, valid


@pytest.mark.parametrize("tracker", ["ocsort", "sort"])
def test_time_sharded_equals_single_device(tracker):
    mesh = make_mesh(8)
    cfg = (
        ScanTrackerConfig.ocsort(
            max_age=30, iou_threshold=0.1, asso="diou", max_tracks=8
        )
        if tracker == "ocsort"
        else ScanTrackerConfig.sort(max_age=30, max_tracks=8)
    )
    # Misses straddling chunk boundaries (200/8 = 25-frame chunks) so the
    # handoff carries ORU freeze state and coasting tracks across chips.
    dets, valid = _scene(miss=set(range(22, 28)) | set(range(95, 103)))

    ref = track_video(cfg, dets, valid)
    out = track_video_time_sharded(cfg, dets, valid, mesh)

    np.testing.assert_array_equal(np.asarray(ref.report), np.asarray(out.report))
    np.testing.assert_array_equal(
        np.asarray(ref.track_id), np.asarray(out.track_id)
    )
    np.testing.assert_allclose(
        np.asarray(ref.box), np.asarray(out.box), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ref.dxdy), np.asarray(out.dxdy), atol=1e-12
    )


def test_time_sharded_ragged_length():
    """T not divisible by the mesh size: padding frames are invisible."""
    mesh = make_mesh(8)
    cfg = ScanTrackerConfig.ocsort(
        max_age=30, iou_threshold=0.1, asso="diou", max_tracks=8
    )
    dets, valid = _scene(n_frames=173, miss={50, 51})
    ref = track_video(cfg, dets, valid)
    out = track_video_time_sharded(cfg, dets, valid, mesh)
    assert np.asarray(out.report).shape[0] == 173
    np.testing.assert_array_equal(np.asarray(ref.report), np.asarray(out.report))
    np.testing.assert_allclose(
        np.asarray(ref.box), np.asarray(out.box), atol=1e-12
    )
