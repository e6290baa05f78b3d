"""Host VelocityTracker parity vs the golden-phase oracle fixture.

The fixture (tests/fixtures/golden_phases.json) was produced by executing the
reference implementation over every committed golden dataframe with plot.py's
exact smoothing (see tools/gen_golden_phases.py).
"""

import json
import os

import pandas as pd
import pytest

from vbt_tpu.analysis.phase import CONCENTRIC
from vbt_tpu.analysis.velocity import analyze_df
from vbt_tpu.contract.schema import parse_df_filename

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_phases.json")
PLATE_DIAMETER = 0.45


def _load_fixture():
    with open(FIXTURE) as f:
        return json.load(f)


def _smooth(df):
    df = df.copy()
    for col in ["x", "y", "dx", "dy"]:
        df[col] = df[col].rolling(window=5, center=False, min_periods=1).mean()
    for col in ["norm_plate_height", "norm_plate_width"]:
        df[col] = df[col].expanding(min_periods=1).mean()
    return df


FIXTURE_DATA = _load_fixture()


@pytest.mark.parametrize("key", sorted(FIXTURE_DATA))
def test_phase_parity(key, reference_root):
    expected = FIXTURE_DATA[key]
    path = reference_root / key
    parsed = parse_df_filename(str(path))
    df = pd.read_pickle(path)
    df = df.query(f"id == {parsed.tracking_id}").drop(columns=["id"])
    phases = analyze_df(_smooth(df), PLATE_DIAMETER)

    assert len(phases) == len(expected), key
    for got, want in zip(phases, expected):
        assert got.type == want["type"]
        assert got.time_start == pytest.approx(want["time_start"], abs=0)
        assert got.time_end == pytest.approx(want["time_end"], abs=0)
        assert got.y_start == pytest.approx(want["y_start"], abs=0)
        assert got.y_end == pytest.approx(want["y_end"], abs=0)
        assert got.rom == pytest.approx(want["rom"], rel=1e-12)


def test_rep_counts_match_filenames():
    # Spot sanity: every fixture entry should contain as many concentric
    # phases as the rep count embedded in the video name, for clean clips.
    data = FIXTURE_DATA
    key = "dfs_ocsort/001_squat_6reps_id1_efficientdet_lite0_whole.pkl.gz"
    conc = [p for p in data[key] if p["type"] == CONCENTRIC]
    assert len(conc) == 6
