"""End-to-end track-CLI throughput on the synthetic demo video.

The north-star metric is device detection fps, but the user-facing pipeline
is track.py: host video decode -> batched device detection -> compiled scan
tracker -> dataframe. This tool records one honest wall-clock number for
that whole path (VERDICT r4, next #6) plus its host/device split, on the
synthesized demo video (the reference's real clips are unobtainable —
gitignored GDrive links, SURVEY.md §2.5). The reference's own hot loop
(/root/reference/track.py:159-199, per-frame TFLite interpreter + Python
tracker) is the thing this path replaces.

Split methodology: `decode+detect` overlaps host decode with async device
dispatch by design (cli/track.py collect_detections), so a separate
decode-ONLY pass over the same video isolates the host cost; the device's
share of the overlapped stage is bounded by (decode+detect) - decode_only.

Usage (idle chip): python -m tools.track_e2e_bench [--seconds 60]
Writes tools/data_track_e2e_r5.json.
"""

import json
import os
import sys
import tempfile
import time

import click
import numpy as np


@click.command()
@click.option("--seconds", default=60.0, type=float, show_default=True)
@click.option("--fps", default=30.0, type=float, show_default=True)
@click.option("--reps", default=20, type=int, show_default=True)
@click.option("--batch_size", default=128, type=int, show_default=True)
@click.option("--model", default="models/efficientdet_lite0_whole.msgpack",
              show_default=True)
def main(seconds, fps, reps, batch_size, model):
    from vbt_tpu.utils.cache import enable_persistent_cache
    from vbt_tpu.utils.health import require_healthy_tpu

    require_healthy_tpu(context="track_e2e_bench")
    enable_persistent_cache()

    from tools.e2e_acv_check import synthesize_scene
    from vbt_tpu.cli.track import collect_detections, track_one
    from vbt_tpu.io.video import VideoReader
    from vbt_tpu.runtime.pipeline import DetectionPipeline, serving_config
    from vbt_tpu.utils.profiling import StageTimer

    on_tpu, dtype = serving_config()
    pipeline = DetectionPipeline.from_model_arg(
        model, use_pallas=on_tpu, dtype=dtype,
    )

    with tempfile.TemporaryDirectory() as d:
        video = os.path.join(d, "demo.mp4")
        synthesize_scene(video, reps=reps, fps=fps, seconds=seconds)

        # Warm pass: pays the detect/tracker compiles so the recorded run
        # measures the pipeline, not the compiler (any real deployment is
        # persistent-cache warm after its first batch).
        warm = StageTimer()
        track_one(pipeline, video, detection_treshold=0.5,
                  tracker_kind="scan", batch_size=batch_size, timer=warm)

        # Decode-only pass: the host-side floor of the overlapped stage.
        t0 = time.perf_counter()
        n_frames = 0
        reader = VideoReader(video, batch_size=batch_size)
        for frames, frame_valid, _ in reader:
            n_frames += int(frame_valid.sum())
        decode_s = time.perf_counter() - t0
        resolution = f"{reader.meta.width}x{reader.meta.height}"

        timer = StageTimer()
        t0 = time.perf_counter()
        data = track_one(pipeline, video, detection_treshold=0.5,
                         tracker_kind="scan", batch_size=batch_size,
                         timer=timer)
        total_s = time.perf_counter() - t0

    stages = {name: round(s, 4) for name, s in timer.totals.items()}
    dd = stages.get("decode+detect", float("nan"))
    record = {
        "video": {"seconds": seconds, "fps": fps, "frames": n_frames,
                  "resolution": resolution, "scene": "pinned demo scene"},
        "batch_size": batch_size,
        "model": os.path.basename(model),
        "wall_s": round(total_s, 4),
        "e2e_fps": round(n_frames / total_s, 1),
        "stages_s": stages,
        "decode_only_s": round(decode_s, 4),
        "decode_only_fps": round(n_frames / decode_s, 1),
        "device_share_of_overlap_s": round(max(0.0, dd - decode_s), 4),
        "df_rows": len(data["id"]),
        "note": (
            "decode+detect overlaps host decode with async device dispatch; "
            "decode_only_s is the host floor measured separately"
        ),
    }
    print(json.dumps(record, indent=1))
    out = os.path.join(os.path.dirname(__file__), "data_track_e2e_r5.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
