"""Live streaming VBT session: video in, per-rep ROM / ACV out as reps end.

BASELINE config 5's user-facing surface. The reference has no single online
entry point — its live loop (track.py:159-246) only draws boxes, and the
per-rep metrics appear offline in plot.py's figure labels (plot.py:165-190:
``ROM`` on the position panel, ``ACV = rom / duration`` on the velocity
panel). This CLI runs that whole stack as one streaming session: chunked
decode -> compiled detect -> compiled tracker scan -> compiled
smoothing+phase scan (:mod:`vbt_tpu.runtime.streaming`), printing each
repetition's metrics the moment its concentric phase completes.

Because the reference's phase filter is retroactive (a later, larger rep can
retire an earlier candidate — VelocityTracker.py:50-67), live lines are
provisional; any rep later retired is announced, and the final summary is
exactly the offline ``plot.py`` phase list (streaming == offline is
equality-tested in tests/test_streaming.py).
"""

from __future__ import annotations

import sys

import click
import numpy as np


def _fmt_rep(i: int, phase) -> str:
    # Same 2-decimal formatting as the figure labels (plot.py:173-190).
    acv = phase.rom / phase.duration
    return (
        f"rep {i}: t=[{phase.time_start:.2f}s, {phase.time_end:.2f}s] "
        f"ROM {phase.rom:0.2f} m  ACV {acv:0.2f} m/s"
    )


def run_stream(
    src,
    model: str,
    detection_threshold: float,
    chunk_size: int,
    plate_diameter: float,
    follow_id: int,
    out=sys.stdout,
    allow_random: bool = False,
    detector=None,
):
    """Drive one streaming session; returns the final phase list.

    ``detector`` injects a prebuilt detection pipeline (tests use a
    deterministic pixel detector); by default it is resolved from
    ``model`` exactly like track.py --model.
    """
    from vbt_tpu.analysis.phase import CONCENTRIC
    from vbt_tpu.io.video import VideoReader
    from vbt_tpu.runtime.pipeline import DetectionPipeline, serving_config
    from vbt_tpu.runtime.streaming import StreamingPipeline

    if detector is None:
        on_tpu, dtype = serving_config()
        detector = DetectionPipeline.from_model_arg(
            model, use_pallas=on_tpu, dtype=dtype,
            allow_random=allow_random,
        )
    reader = VideoReader(src, batch_size=chunk_size)
    fps = reader.meta.fps
    if not fps or fps <= 0:
        # Live captures commonly report CAP_PROP_FPS == 0; a zero fps would
        # divide-by-zero in the timestamp math, so assume a webcam default.
        fps = 30.0
        print("source reports no fps; assuming 30.0", file=out, flush=True)
    pipe = StreamingPipeline(
        detector=detector,
        fps=fps,
        detection_threshold=detection_threshold,
        plate_diameter=plate_diameter,
        follow_id=follow_id,
    )

    # Keyed by time_start: the retro-filter can retire printed reps. Live
    # rep numbers follow announcement order (stable even after an earlier
    # rep retires); the final summary re-lists the canonical numbering.
    announced: dict[float, int] = {}
    next_rep = 1
    for frames, frame_valid, _ in reader:
        keep = int(frame_valid.sum())
        if keep == 0:
            continue
        pipe.process_frames(np.asarray(frames[:keep]))
        # Only completed phases print live (an open rep's metrics would
        # still move); the final summary below includes the last flush.
        conc = [p for p in pipe.phases(include_open=False) if p.type == CONCENTRIC]
        current = {p.time_start: p for p in conc}
        for gone in [t for t in announced if t not in current]:
            print(
                f"(rep {announced[gone]} at t={gone:.2f}s retired by a "
                f"larger rep)",
                file=out, flush=True,
            )
            del announced[gone]
        for p in conc:
            if p.time_start not in announced:
                announced[p.time_start] = next_rep
                print(_fmt_rep(next_rep, p), file=out, flush=True)
                next_rep += 1

    phases = pipe.phases()
    conc = [p for p in phases if p.type == CONCENTRIC]
    print(f"session complete: {len(conc)} reps", file=out, flush=True)
    for i, p in enumerate(conc, 1):
        print(_fmt_rep(i, p), file=out, flush=True)
    return phases


@click.command()
@click.argument("src")
@click.option("--model", default="models/efficientdet_lite0_whole.msgpack",
              show_default=True,
              help="Spec name, .msgpack checkpoint, or reference-style "
                   ".tflite path (resolved like track.py --model).")
@click.option("--detection_treshold", default=0.5, show_default=True,
              help="Score threshold (reference track.py:69 spelling).")
@click.option("--chunk_size", default=64, show_default=True,
              help="Frames per streamed device chunk.")
@click.option("--plate_diameter", default=0.45, show_default=True,
              help="Weight-plate diameter in meters (plot.py:54).")
@click.option("--follow_id", default=1, show_default=True,
              help="Track id to analyze (OC-SORT's stable identity is 1).")
def main(src, model, detection_treshold, chunk_size, plate_diameter, follow_id):
    """Stream SRC (a video file path, or a camera index like '0') through
    detect -> track -> phase analysis, printing per-rep ROM / ACV live."""
    from vbt_tpu.utils.cache import enable_persistent_cache
    from vbt_tpu.utils.health import require_healthy_tpu

    enable_persistent_cache()
    require_healthy_tpu(context="stream")  # fail fast on a wedged tunnel
    if src.isdigit():  # camera index, as cv2.VideoCapture accepts
        src = int(src)
    run_stream(
        src, model, detection_treshold, chunk_size, plate_diameter, follow_id
    )


if __name__ == "__main__":
    main()
