"""vbt-stream CLI: live per-rep ROM/ACV output equals the offline analysis.

BASELINE config 5's deliverable: the streaming session must print each
rep's ROM / ACV as its concentric phase completes, and the final summary
must equal the offline track -> smooth -> analyze pipeline (the plot.py
figure labels) on the same video.
"""

import io
import re

import numpy as np
import pytest

pytest.importorskip("cv2")

from tests.test_track_cli import FPS, PixelDetector, synthetic_video  # noqa: F401
from vbt_tpu.analysis.phase import CONCENTRIC
from vbt_tpu.cli.plot import analyze_phases, smooth_track_df
from vbt_tpu.cli.stream import run_stream
from vbt_tpu.cli.track import track_one
from vbt_tpu.contract.schema import build_track_df


def test_stream_cli_matches_offline(synthetic_video):  # noqa: F811
    out = io.StringIO()
    phases = run_stream(
        synthetic_video,
        model="unused",
        detection_threshold=0.5,
        chunk_size=32,
        plate_diameter=0.45,
        follow_id=1,
        out=out,
        detector=PixelDetector(),
    )
    text = out.getvalue()

    # Offline lane: track -> df -> rolling smooth -> host VelocityTracker.
    df = build_track_df(
        track_one(PixelDetector(), synthetic_video, 0.5, "host")
    )
    offline = analyze_phases(
        smooth_track_df(df[df["id"] == 1].drop(columns=["id"])),
        plate_diameter=0.45,
        engine="host",
    )
    off_conc = [p for p in offline if p.type == CONCENTRIC]
    conc = [p for p in phases if p.type == CONCENTRIC]

    assert len(conc) == len(off_conc) == 3
    for p, q in zip(conc, off_conc):
        assert p.time_start == pytest.approx(q.time_start, abs=1e-9)
        assert p.time_end == pytest.approx(q.time_end, abs=1e-9)
        assert p.rom == pytest.approx(q.rom, rel=1e-9)

    # Live lines appeared (one per rep) and the summary repeats them with
    # the figure-label formatting (plot.py:173-190 two-decimal ROM/ACV).
    rep_lines = re.findall(r"rep \d+: .*ROM (\d+\.\d{2}) m  ACV (\d+\.\d{2}) m/s", text)
    assert len(rep_lines) >= 3
    assert "session complete: 3 reps" in text
    for p, (rom_s, acv_s) in zip(off_conc, rep_lines[-3:]):
        assert rom_s == f"{p.rom:0.2f}"
        assert acv_s == f"{p.rom / p.duration:0.2f}"


def test_stream_cli_live_lines_precede_completion(synthetic_video):  # noqa: F811
    """Reps print DURING the stream: with 3 reps over 180 frames in chunks
    of 32, at least the first two live lines must appear before the final
    summary marker."""
    out = io.StringIO()
    run_stream(
        synthetic_video,
        model="unused",
        detection_threshold=0.5,
        chunk_size=32,
        plate_diameter=0.45,
        follow_id=1,
        out=out,
        detector=PixelDetector(),
    )
    text = out.getvalue()
    head = text.split("session complete")[0]
    assert len(re.findall(r"rep \d+:", head)) >= 2
