"""Generate ground-truth validation oracle fixtures.

Executes the *reference* kinovea.py / qualysis.py CLIs in-process (with a
pandas-3 compat shim for the removed ``DataFrame.applymap``) against the
committed exports + dataframes, and parses their printed LaTeX tables into
JSON (per-video MSE and Pearson r). Our CLIs are then tested to reproduce
those numbers.

Usage: python tools/gen_groundtruth_metrics.py
"""

import importlib
import json
import os
import re
import sys

import matplotlib

matplotlib.use("Agg")

import pandas as pd  # noqa: E402

if not hasattr(pd.DataFrame, "applymap"):  # removed in pandas 3
    pd.DataFrame.applymap = pd.DataFrame.map

from click.testing import CliRunner  # noqa: E402

REFERENCE = "/root/reference"
OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "groundtruth_metrics.json"
)

ROW_RE = re.compile(
    r"\\texttt\{(?P<video>[^}]*)\} & \$(?P<mse_x>[-0-9.]+)\$ & \$(?P<mse_y>[-0-9.]+)\$"
    r" & \$(?P<r_x>[-0-9.]+)\$ & \$(?P<r_y>[-0-9.]+)\$"
)


def run(module_name):
    sys.path.insert(0, REFERENCE)
    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        mod = importlib.import_module(module_name)
        result = CliRunner().invoke(mod.main, [], catch_exceptions=False)
        out = result.output
    finally:
        os.chdir(cwd)
        sys.path.remove(REFERENCE)

    rows = {}
    for m in ROW_RE.finditer(out):
        video = m.group("video").replace("\\_", "_")
        rows[video] = {
            "mse_x": float(m.group("mse_x")),
            "mse_y": float(m.group("mse_y")),
            "r_x": float(m.group("r_x")),
            "r_y": float(m.group("r_y")),
        }
    total = re.search(r"Total MSEx = ([0-9.e+-]+), MSEy = ([0-9.e+-]+)", out)
    return {
        "rows": rows,
        "total_mse_x": float(total.group(1)) if total else None,
        "total_mse_y": float(total.group(2)) if total else None,
    }


def main():
    fixture = {
        "kinovea": run("kinovea"),
        "qualisys": run("qualysis"),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(fixture, f, indent=1, sort_keys=True)
    print(f"kinovea rows: {len(fixture['kinovea']['rows'])}")
    print(f"qualisys rows: {len(fixture['qualisys']['rows'])}")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
