"""All 34 reconstructed golden streams through ONE track_clips program.

Round-2 sized the multi-clip runner tests at <=4 synthetic clips; this
exercises the real workload shape (BASELINE config 4): every dfs_ocsort/
clip's reconstructed detection stream — ragged lengths 699..5481 frames —
tracked in a single vmapped scan sharded over the 8-device CPU mesh, with
per-clip output equal to the single-clip ``track_video`` scan.

The clips axis (34) is not divisible by the mesh (8), so it pads to 40
with inert clips (all-invalid frames) — the same padding rule track_many
applies for ragged production workloads.
"""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from tests.test_tracker_golden_replay import _detections_by_time, _golden_files
from vbt_tpu.parallel.mesh import make_mesh
from vbt_tpu.runtime.batch_runner import pad_clips, shard_clips, track_clips
from vbt_tpu.tracking.scan import ScanTrackerConfig, track_video


def _stream_arrays(f, d_cap):
    dets_t = _detections_by_time(pd.read_pickle(f))
    times = sorted(dets_t)
    t = len(times)
    dets = np.zeros((t, d_cap, 6))
    valid = np.zeros((t, d_cap), bool)
    for i, tt in enumerate(times):
        rows = dets_t[tt]
        n = min(len(rows), d_cap)
        dets[i, :n] = rows[:n]
        valid[i, :n] = True
    return dets, valid


@pytest.mark.slow  # ~20 min: 40 vmapped 5481-frame scans + 34 single scans
def test_track_clips_all_34_goldens_sharded(reference_root):
    files = _golden_files()
    assert len(files) == 34
    # Max simultaneous detections across all golden frames is small; cap at
    # 6 (measured max is 3) so the (34, 5481, D, 6) batch stays modest.
    d_cap = 6
    clips = [_stream_arrays(f, d_cap) for f in files]

    cfg = ScanTrackerConfig.ocsort(
        max_age=30, min_hits=1, iou_threshold=0.1, asso="diou", max_tracks=8
    )
    dets, det_valid, frame_valid = pad_clips(
        [c[0] for c in clips], [c[1] for c in clips]
    )
    # Pad the clips axis up to the mesh size multiple with inert clips.
    n_pad = -len(clips) % 8
    dets = np.concatenate([dets, np.zeros_like(dets[:n_pad])])
    det_valid = np.concatenate([det_valid, np.zeros_like(det_valid[:n_pad])])
    frame_valid = np.concatenate([frame_valid, np.zeros_like(frame_valid[:n_pad])])

    mesh = make_mesh(8)
    dets, det_valid, frame_valid = shard_clips(mesh, dets, det_valid, frame_valid)
    with mesh:
        batched = track_clips(cfg, dets, det_valid, frame_valid)
    batched = {k: np.asarray(v) for k, v in batched._asdict().items()}

    for i, (d, v) in enumerate(clips):
        single = track_video(cfg, d, v, skip_empty_frames=True)
        t = d.shape[0]
        name = os.path.basename(files[i])
        np.testing.assert_array_equal(
            batched["report"][i][:t], np.asarray(single.report), err_msg=name
        )
        m = np.asarray(single.report)
        np.testing.assert_allclose(
            batched["box"][i][:t][m], np.asarray(single.box)[m],
            atol=1e-12, err_msg=name,
        )
        np.testing.assert_array_equal(
            batched["track_id"][i][:t][m], np.asarray(single.track_id)[m],
            err_msg=name,
        )
        assert not batched["report"][i][t:].any(), name
