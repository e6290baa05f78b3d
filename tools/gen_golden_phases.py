"""Generate the golden-phase oracle fixture.

Runs the *reference implementation* (imported from /root/reference, never
copied) of the VelocityTracker phase segmentation over every committed golden
dataframe, applying exactly the smoothing plot.py applies (plot.py:90-95),
and records the resulting phases as JSON. The fixture pins down the exact
behaviour our re-implementation must reproduce bit-for-bit.

Usage: python tools/gen_golden_phases.py
"""

import glob
import json
import os
import sys

import pandas as pd

REFERENCE = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "golden_phases.json")

sys.path.insert(0, REFERENCE)

from VelocityTracker import VelocityTracker  # noqa: E402  (reference code)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from vbt_tpu.contract.schema import parse_df_filename  # noqa: E402

PLATE_DIAMETER = 0.45  # plot.py:53 default


def analyze(df: pd.DataFrame) -> list[dict]:
    # Smoothing exactly as plot.py:90-95.
    df = df.copy()
    for col in ["x", "y", "dx", "dy"]:
        df[col] = df[col].rolling(window=5, center=False, min_periods=1).mean()
    for col in ["norm_plate_height", "norm_plate_width"]:
        df[col] = df[col].expanding(min_periods=1).mean()

    vt = VelocityTracker(PLATE_DIAMETER)
    for _, (time, x, y, dx, dy, nph, npw) in df.iterrows():
        vt.process_measurements(time, x, y, dx, dy, nph, npw)
    vt.end_processing()

    return [
        {
            "type": int(p.type),
            "time_start": float(p.time_start),
            "time_end": float(p.time_end),
            "y_start": float(p.y_start),
            "y_end": float(p.y_end),
            "rom": float(p.rom),
        }
        for p in vt.phases
    ]


def main():
    fixture = {}
    for sub in ["dfs", "dfs_ocsort", "qualysis_dfs"]:
        for path in sorted(glob.glob(os.path.join(REFERENCE, sub, "*.pkl.gz"))):
            if "eval_detections" in path:
                continue
            name = os.path.basename(path)
            parsed = parse_df_filename(name)
            df = pd.read_pickle(path)
            df = df.query(f"id == {parsed.tracking_id}").drop(columns=["id"])
            fixture[f"{sub}/{name}"] = analyze(df)
            print(f"{sub}/{name}: {len(fixture[f'{sub}/{name}'])} phases")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(fixture, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
