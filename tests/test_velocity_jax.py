"""Device-lane (lax.scan) phase segmentation vs the exact host lane."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pytest

from vbt_tpu.analysis import smoothing
from vbt_tpu.analysis.velocity import VelocityTracker, analyze_df
from vbt_tpu.analysis.velocity_jax import analyze_series, to_phase_list
from vbt_tpu.contract.schema import parse_df_filename

PLATE_DIAMETER = 0.45
FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_phases.json")

with open(FIXTURE) as f:
    FIXTURE_KEYS = sorted(json.load(f))


def test_rolling_mean_matches_pandas():
    rng = np.random.default_rng(0)
    x = rng.normal(size=501)
    for w in (5, 30):
        got = np.asarray(smoothing.rolling_mean(x, w))
        want = pd.Series(x).rolling(window=w, min_periods=1).mean().to_numpy()
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_expanding_mean_matches_pandas():
    rng = np.random.default_rng(1)
    x = rng.normal(size=257)
    got = np.asarray(smoothing.expanding_mean(x))
    want = pd.Series(x).expanding(min_periods=1).mean().to_numpy()
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_shared_plate_average_matches_reference_quirk():
    # Interleaved width/height through one shared 30-window — vectorized vs
    # the exact sliding-total host implementation.
    rng = np.random.default_rng(2)
    w = rng.uniform(0.1, 0.3, size=400)
    h = rng.uniform(0.1, 0.3, size=400)
    w_np, h_np = smoothing.shared_plate_average_np(w, h)
    w_j, h_j = smoothing.shared_plate_average(w, h)
    np.testing.assert_allclose(np.asarray(w_j), w_np, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(h_j), h_np, rtol=1e-12)


def _series_from_df(df):
    cols = ["time", "x", "y", "dx", "dy", "norm_plate_height", "norm_plate_width"]
    return [df[c].to_numpy(dtype=np.float64) for c in cols]


def _phases_equal(host, device, rel=1e-9):
    assert len(host) == len(device)
    for a, b in zip(host, device):
        assert a.type == b.type
        assert a.time_start == pytest.approx(b.time_start, rel=rel)
        assert a.time_end == pytest.approx(b.time_end, rel=rel)
        assert a.y_start == pytest.approx(b.y_start, rel=rel)
        assert a.y_end == pytest.approx(b.y_end, rel=rel)
        assert a.rom == pytest.approx(b.rom, rel=rel)


@pytest.mark.parametrize("key", FIXTURE_KEYS)
def test_scan_matches_host_on_golden(key, reference_root):
    path = reference_root / key
    parsed = parse_df_filename(str(path))
    df = pd.read_pickle(path)
    df = df.query(f"id == {parsed.tracking_id}").drop(columns=["id"])

    smoothed = df.copy()
    for col in ["x", "y", "dx", "dy"]:
        smoothed[col] = smoothed[col].rolling(window=5, min_periods=1).mean()
    for col in ["norm_plate_height", "norm_plate_width"]:
        smoothed[col] = smoothed[col].expanding(min_periods=1).mean()
    host_phases = analyze_df(smoothed, PLATE_DIAMETER)

    pa = analyze_series(*_series_from_df(df), plate_diameter=PLATE_DIAMETER)
    device_phases = to_phase_list(pa)
    _phases_equal(host_phases, device_phases)


def test_scan_matches_host_on_synthetic_noise():
    # Randomized fuzz: noisy sinusoidal bar paths with direction dithering.
    rng = np.random.default_rng(7)
    for trial in range(10):
        n = int(rng.integers(50, 800))
        t = np.arange(n) / 30.0
        freq = rng.uniform(0.1, 0.6)
        y = 0.5 + 0.2 * np.sin(2 * np.pi * freq * t) + rng.normal(0, 0.002, n)
        x = 0.4 + rng.normal(0, 0.005, n)
        dy = np.gradient(y)
        dx = np.gradient(x)
        nph = np.full(n, 0.16) + rng.normal(0, 0.01, n)
        npw = np.full(n, 0.28) + rng.normal(0, 0.01, n)

        df = pd.DataFrame(
            {
                "time": t,
                "x": x,
                "y": y,
                "dx": dx,
                "dy": dy,
                "norm_plate_height": nph,
                "norm_plate_width": npw,
            }
        )
        smoothed = df.copy()
        for col in ["x", "y", "dx", "dy"]:
            smoothed[col] = smoothed[col].rolling(window=5, min_periods=1).mean()
        for col in ["norm_plate_height", "norm_plate_width"]:
            smoothed[col] = smoothed[col].expanding(min_periods=1).mean()
        host_phases = analyze_df(smoothed, PLATE_DIAMETER)

        pa = analyze_series(*_series_from_df(df), plate_diameter=PLATE_DIAMETER)
        device_phases = to_phase_list(pa)
        _phases_equal(host_phases, device_phases)
