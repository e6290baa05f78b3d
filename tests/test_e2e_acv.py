"""End-to-end ROM/ACV validation against analytic ground truth.

The reference's own sample videos are unobtainable (gitignored, GDrive —
SURVEY.md §2.5), so the 1% per-rep budget (BASELINE.json north star) is
closed on a synthesized video with a *programmed* trajectory: a camera
window pans sinusoidally over a real annotated test image
(tools/make_demo_video.py), giving exact analytic plate positions. The
full shipped pipeline — trained lite0 checkpoint -> fused detection ->
scan tracker -> smoothing -> phase segmentation — must reproduce each
rep's ROM and ACV within 1% of the same analysis run on the analytic
trajectory.
"""

import os
import sys

import numpy as np
import pandas as pd
import pytest

pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "models", "efficientdet_lite0_whole.msgpack")
REPS, FPS, SECONDS = 3, 30.0, 9.0


@pytest.fixture(scope="module")
def demo(tmp_path_factory):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from tools.make_demo_video import synthesize

    d = tmp_path_factory.mktemp("e2e")
    video = str(d / "demo_3reps.mp4")
    _, traj, _ = synthesize(video, reps=REPS, fps=FPS, seconds=SECONDS)
    return video, pd.DataFrame(traj)


def _phases_of(df, engine="host"):
    from vbt_tpu.cli.plot import analyze_phases, smooth_track_df

    return analyze_phases(
        smooth_track_df(df), plate_diameter=0.45, engine=engine
    )


def _acv_check(video, traj, reps, budget=0.01):
    """Shared body: full shipped pipeline vs analytic lane, per-rep budget."""
    from vbt_tpu.analysis.phase import CONCENTRIC
    from vbt_tpu.cli.track import track_one
    from vbt_tpu.contract.schema import build_track_df, max_travel_id
    from vbt_tpu.runtime.pipeline import DetectionPipeline

    adf = traj.assign(dx=0.0, dy=0.0)[
        ["time", "x", "y", "dx", "dy", "norm_plate_height", "norm_plate_width"]
    ]
    truth = [p for p in _phases_of(adf) if p.type == CONCENTRIC]
    assert len(truth) == reps

    pipeline = DetectionPipeline.from_model_arg(CKPT, use_pallas=False)
    data = track_one(pipeline, video, detection_treshold=0.5, tracker_kind="scan")
    df = build_track_df(data)
    fid = max_travel_id(df)
    measured = [
        p
        for p in _phases_of(df[df["id"] == fid].drop(columns=["id"]))
        if p.type == CONCENTRIC
    ]
    assert len(measured) == reps

    for t, m in zip(truth, measured):
        rom_err = abs(m.rom - t.rom) / t.rom
        acv_t = t.rom / t.duration
        acv_m = m.rom / m.duration
        acv_err = abs(acv_m - acv_t) / acv_t
        assert rom_err < budget, (t.rom, m.rom, rom_err)
        assert acv_err < budget, (acv_t, acv_m, acv_err)


# Single-annotated-plate image for the quick lane. The slow lane's picker
# image contains TWO equally-confident plates panning with identical
# amplitude, so which one wins max_travel_id is decided by sub-pixel jitter —
# fine at 3 reps (the clean plate wins) but a coin flip at 1 rep. This image
# has exactly one annotated plate with ample pan range.
QUICK_IMAGE = (
    "Captura-de-Pantalla-2022-07-18-a-las-19-26-59_png"
    ".rf.4128bd7999946b4dc43e908213797f4f.jpg"
)


@pytest.mark.skipif(not os.path.isfile(CKPT), reason="needs shipped weights")
def test_detector_pipeline_acv_quick(tmp_path):
    """Default-lane smoke guard for the flagship e2e path: 1 rep at 30 fps
    (60 frames, one detect batch) through the full shipped
    detector->tracker->smoothing->phase pipeline.

    Budget is 7%, NOT the flagship 1%: the reference's ROM is a PATH
    INTEGRAL (per-step |dx|+|dy|, velocity.py:62-74), so per-frame detector
    box jitter accumulates linearly into measured ROM. On this pinned image
    the shipped lite0 measures a stable 3.2% (a scan over 7 single-plate
    candidates measured 3.2-15%; the slow lane's <1% is a property of its
    exceptionally clean-detection image). 7% separates that floor from the
    real failure modes this test guards: wrong-track selection (15-84%),
    broken detect/track/phase (no reps at all). The 1% guarantee itself is
    enforced by the slow lane (3 reps, 270 frames) and the TPU lane
    (tools/e2e_acv_check.py)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from tools.make_demo_video import synthesize

    video = str(tmp_path / "demo_quick.mp4")
    _, traj, _ = synthesize(video, reps=1, fps=30.0, seconds=2.0,
                            image=QUICK_IMAGE)
    _acv_check(video, pd.DataFrame(traj), reps=1, budget=0.07)


@pytest.mark.slow  # ~5 min of CPU inference; TPU lane: tools/e2e_acv_check.py
@pytest.mark.skipif(not os.path.isfile(CKPT), reason="needs shipped weights")
def test_detector_pipeline_acv_within_1pct(demo):
    # Analytic lane vs the real shipped pipeline end to end: the analysis
    # itself is exact vs the reference (tests/test_velocity_host.py), so
    # this isolates detector+tracker error.
    video, traj = demo
    _acv_check(video, traj, REPS)
