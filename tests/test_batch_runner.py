"""Multi-clip vmapped/sharded tracking vs per-clip runs (8-device CPU mesh)."""

import jax
import numpy as np

from vbt_tpu.parallel.mesh import make_mesh
from vbt_tpu.runtime.batch_runner import pad_clips, shard_clips, track_clips
from vbt_tpu.tracking.scan import ScanTrackerConfig, track_video

D_CAP = 8


def _clip(seed, n_frames):
    rng = np.random.default_rng(seed)
    dets = np.zeros((n_frames, D_CAP, 6))
    valid = np.zeros((n_frames, D_CAP), bool)
    for f in range(n_frames):
        if rng.uniform() < 0.1:
            continue  # empty frame
        y = 0.3 + 0.3 * np.sin(2 * np.pi * f / n_frames + seed)
        dets[f, 0] = [0.2, y, 0.4, y + 0.15, 0.9, 0]
        valid[f, 0] = True
    return dets, valid


def test_track_clips_matches_per_clip_runs():
    cfg = ScanTrackerConfig.ocsort(max_age=10, asso="diou", iou_threshold=0.1,
                                   max_tracks=D_CAP)
    clips = [_clip(s, n) for s, n in [(0, 50), (1, 72), (2, 31), (3, 64)]]
    dets, det_valid, frame_valid = pad_clips(
        [c[0] for c in clips], [c[1] for c in clips]
    )
    batched = track_clips(cfg, dets, det_valid, frame_valid)

    for i, (d, v) in enumerate(clips):
        single = track_video(cfg, d, v, skip_empty_frames=True)
        t = d.shape[0]
        np.testing.assert_array_equal(
            np.asarray(batched.report[i][:t]), np.asarray(single.report)
        )
        m = np.asarray(single.report)
        np.testing.assert_allclose(
            np.asarray(batched.box[i][:t])[m], np.asarray(single.box)[m], atol=1e-12
        )
        np.testing.assert_array_equal(
            np.asarray(batched.track_id[i][:t])[m], np.asarray(single.track_id)[m]
        )
        # padding frames report nothing
        assert not np.asarray(batched.report[i][t:]).any()


def test_track_clips_sharded_over_mesh():
    assert len(jax.devices()) == 8, "tests expect the 8-device CPU mesh"
    cfg = ScanTrackerConfig.ocsort(max_age=10, asso="diou", iou_threshold=0.1,
                                   max_tracks=D_CAP)
    clips = [_clip(s, 40) for s in range(8)]
    dets, det_valid, frame_valid = pad_clips(
        [c[0] for c in clips], [c[1] for c in clips]
    )
    mesh = make_mesh(8)
    with mesh:
        sharded = shard_clips(mesh, dets, det_valid, frame_valid)
        out = track_clips(cfg, *sharded)
        jax.block_until_ready(out)
    # Sharded result equals the unsharded one.
    plain = track_clips(cfg, dets, det_valid, frame_valid)
    np.testing.assert_array_equal(np.asarray(out.report), np.asarray(plain.report))
    m = np.asarray(plain.report)
    np.testing.assert_allclose(
        np.asarray(out.box)[m], np.asarray(plain.box)[m], atol=1e-12
    )
