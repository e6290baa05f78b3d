"""End-to-end track CLI: synthetic video -> detections -> scan tracker -> df.

A pixel-threshold "perfect detector" stands in for the neural detector so
the full plumbing (video IO, batching, tracker, dataframe contract, phase
analysis) is exercised deterministically.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vbt_tpu.analysis.phase import CONCENTRIC
from vbt_tpu.cli.plot import analyze_phases, smooth_track_df
from vbt_tpu.cli.track import track_one
from vbt_tpu.contract.schema import build_track_df, max_travel_id, validate_track_df
from vbt_tpu.ops.postprocess import Detections

W, H, FPS, FRAMES = 320, 240, 30.0, 180
SQUARE = 40


def _square_center(t):
    """3 full reps of vertical motion over the clip."""
    phase = 3 * 2 * np.pi * t / FRAMES
    y = 0.5 + 0.3 * np.sin(phase)
    return 0.5, y


@pytest.fixture(scope="module")
def synthetic_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("video") / "synthetic_squat_3reps.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (W, H))
    for t in range(FRAMES):
        frame = np.zeros((H, W, 3), np.uint8)
        cx, cy = _square_center(t)
        x1 = int(cx * W - SQUARE / 2)
        y1 = int(cy * H - SQUARE / 2)
        cv2.rectangle(frame, (x1, y1), (x1 + SQUARE, y1 + SQUARE), (255, 255, 255), -1)
        writer.write(frame)
    writer.release()
    return path


class PixelDetector:
    """Thresholds bright pixels into one detection per frame."""

    def detect_batch(self, frames, score_threshold=0.0):
        b = frames.shape[0]
        boxes = np.zeros((b, 25, 4), np.float32)
        scores = np.zeros((b, 25), np.float32)
        counts = np.zeros(b, np.int32)
        for i in range(b):
            mask = frames[i].max(axis=-1) > 128
            ys, xs = np.nonzero(mask)
            if len(ys):
                boxes[i, 0] = [
                    ys.min() / frames.shape[1],
                    xs.min() / frames.shape[2],
                    (ys.max() + 1) / frames.shape[1],
                    (xs.max() + 1) / frames.shape[2],
                ]
                scores[i, 0] = 0.95
                counts[i] = 1
        return Detections(
            count=counts, scores=scores, classes=np.zeros((b, 25), np.int32),
            boxes=boxes,
        )

    def detections_to_tracker_inputs(self, det, threshold):
        from vbt_tpu.runtime.pipeline import DetectionPipeline

        return DetectionPipeline.detections_to_tracker_inputs(self, det, threshold)


@pytest.mark.parametrize("tracker_kind", ["scan", "host"])
def test_track_end_to_end(synthetic_video, tracker_kind, tmp_path):
    video_out = str(tmp_path / "annotated.mp4")
    data = track_one(
        PixelDetector(), synthetic_video, detection_treshold=0.5,
        tracker_kind=tracker_kind, video_path=video_out,
    )
    df = build_track_df(data)
    assert validate_track_df(df) == []
    assert df["id"].nunique() == 1
    assert max_travel_id(df) == int(df["id"].iloc[0])
    assert len(df) == FRAMES
    # times are (frame_count)/fps starting at 1/fps
    assert df["time"].min() == pytest.approx(1 / FPS)
    # y tracks the scripted sinusoid
    t_idx = (df["time"].to_numpy() * FPS).round().astype(int) - 1
    expected_y = np.array([_square_center(t)[1] for t in t_idx])
    np.testing.assert_allclose(df["y"].to_numpy(), expected_y, atol=0.02)
    # annotated video was written
    assert os.path.getsize(video_out) > 0

    # Phase analysis finds the 3 scripted reps.
    smoothed = smooth_track_df(df.drop(columns=["id"]))
    phases = analyze_phases(smoothed, plate_diameter=0.45, engine="host")
    conc = [p for p in phases if p.type == CONCENTRIC]
    assert len(conc) == 3


def test_scan_and_host_trackers_agree(synthetic_video):
    data_scan = track_one(PixelDetector(), synthetic_video, 0.5, "scan")
    data_host = track_one(PixelDetector(), synthetic_video, 0.5, "host")
    for col in ["id", "time", "x", "y", "norm_plate_height", "norm_plate_width"]:
        np.testing.assert_allclose(
            np.asarray(data_scan[col], float),
            np.asarray(data_host[col], float),
            atol=1e-5,
            err_msg=col,
        )
    # Kalman velocities: scan runs float64 here (x64 tests), host float64.
    np.testing.assert_allclose(
        np.asarray(data_scan["dy"]), np.asarray(data_host["dy"]), atol=1e-5
    )


@pytest.mark.slow  # 11 s; the time-shard carry relay itself is pinned by
# tests/test_time_shard.py and exercised in the driver's 8-device dryrun —
# this only re-checks the CLI flag plumbing.
def test_time_shard_cli_equals_default(synthetic_video):
    """--time_shard output is bit-equal to the plain scan at the CLI level
    (8-device CPU mesh; vbt_tpu.parallel.time_shard)."""
    det = PixelDetector()
    plain = track_one(det, synthetic_video, 0.5, tracker_kind="scan")
    sharded = track_one(
        det, synthetic_video, 0.5, tracker_kind="scan", time_shard=True
    )
    assert plain["id"] == sharded["id"]
    for col in ("time", "x", "y", "dx", "dy"):
        np.testing.assert_allclose(plain[col], sharded[col], atol=1e-12)


def test_real_pipeline_smoke():
    """Random-weight EfficientDet end to end on a tiny frame batch (CPU)."""
    from vbt_tpu.runtime.pipeline import DetectionPipeline

    pipe = DetectionPipeline.from_model_arg("efficientdet_lite0", allow_random=True)
    frames = np.random.default_rng(0).integers(
        0, 255, size=(2, 240, 320, 3), dtype=np.uint8
    )
    det = pipe.detect_batch(frames)
    assert det.boxes.shape == (2, 25, 4)
    assert det.scores.shape == (2, 25)
    rows, valid = pipe.detections_to_tracker_inputs(det, threshold=0.0)
    assert rows.shape == (2, 25, 6)
    assert valid.shape == (2, 25)


def test_track_many_matches_track_one(synthetic_video):
    from vbt_tpu.cli.track import track_many

    results = track_many(PixelDetector(), [synthetic_video, synthetic_video], 0.5)
    single = track_one(PixelDetector(), synthetic_video, 0.5, "scan")
    for data in results.values():
        for col in ["id", "time", "x", "y"]:
            np.testing.assert_allclose(
                np.asarray(data[col], float), np.asarray(single[col], float),
                atol=1e-6, err_msg=col,
            )
