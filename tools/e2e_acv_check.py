"""End-to-end ROM/ACV validation on the TPU (north-star 1% budget).

Same check as tests/test_e2e_acv.py (which runs it on CPU in the slow
lane), sized for the real chip: synthesizes the programmed-trajectory demo
video, runs the SHIPPED pipeline (checkpoint -> fused detect -> scan
tracker -> smoothing -> phase analysis), and compares each rep's ROM/ACV
against the same analysis run on the analytic trajectory.

Usage: python -m tools.e2e_acv_check [--reps 4] [--seconds 12]
Prints one line per rep plus PASS/FAIL against the 1% budget.
"""

import os
import sys
import tempfile

import click
import numpy as np
import pandas as pd


@click.command()
@click.option("--reps", default=4, type=int)
@click.option("--fps", default=30.0, type=float)
@click.option("--seconds", default=12.0, type=float)
@click.option("--model", default="models/efficientdet_lite0_whole.msgpack",
              show_default=True)
def main(reps, fps, seconds, model):
    from vbt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.make_demo_video import synthesize
    from vbt_tpu.analysis.phase import CONCENTRIC
    from vbt_tpu.cli.plot import analyze_phases, smooth_track_df
    from vbt_tpu.cli.track import track_one
    from vbt_tpu.contract.schema import build_track_df, max_travel_id
    from vbt_tpu.runtime.pipeline import DetectionPipeline, serving_config

    with tempfile.TemporaryDirectory() as d:
        video = os.path.join(d, "demo.mp4")
        _, traj, _ = synthesize(video, reps=reps, fps=fps, seconds=seconds)

        adf = pd.DataFrame(traj).assign(dx=0.0, dy=0.0)[
            ["time", "x", "y", "dx", "dy",
             "norm_plate_height", "norm_plate_width"]
        ]
        truth = [
            p
            for p in analyze_phases(
                smooth_track_df(adf), plate_diameter=0.45, engine="host"
            )
            if p.type == CONCENTRIC
        ]

        on_tpu, dtype = serving_config()
        pipeline = DetectionPipeline.from_model_arg(
            model, use_pallas=on_tpu, dtype=dtype,
        )
        data = track_one(pipeline, video, detection_treshold=0.5,
                         tracker_kind="scan")
        df = build_track_df(data)
        fid = max_travel_id(df)
        measured = [
            p
            for p in analyze_phases(
                smooth_track_df(df[df["id"] == fid].drop(columns=["id"])),
                plate_diameter=0.45,
                engine="host",
            )
            if p.type == CONCENTRIC
        ]

    ok = len(truth) == len(measured) == reps
    print(f"reps: analytic {len(truth)}, measured {len(measured)} (want {reps})")
    for i, (t, m) in enumerate(zip(truth, measured), 1):
        acv_t, acv_m = t.rom / t.duration, m.rom / m.duration
        rom_err = abs(m.rom - t.rom) / t.rom
        acv_err = abs(acv_m - acv_t) / acv_t
        ok &= rom_err < 0.01 and acv_err < 0.01
        print(
            f"rep {i}: ROM {t.rom:.4f} vs {m.rom:.4f} m ({rom_err * 100:.2f}%)"
            f"  ACV {acv_t:.4f} vs {acv_m:.4f} m/s ({acv_err * 100:.2f}%)"
        )
    print("PASS (all reps within the 1% budget)" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
