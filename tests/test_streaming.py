"""Streaming session equals offline batch analysis, chunk size independent."""

import numpy as np
import pandas as pd
import pytest

from vbt_tpu.analysis.velocity import analyze_df
from vbt_tpu.contract.schema import parse_df_filename
from vbt_tpu.runtime.streaming import StreamingAnalyzer

KEYS = [
    "dfs_ocsort/001_squat_6reps_id1_efficientdet_lite0_whole.pkl.gz",
    "dfs_ocsort/025_dl_8reps_id1_efficientdet_lite0_whole.pkl.gz",
    "qualysis_dfs/squat1_mobile_side_6reps_id23_efficientdet_lite0_whole.pkl.gz",
]


def _load(reference_root, key):
    path = reference_root / key
    parsed = parse_df_filename(str(path))
    df = pd.read_pickle(path)
    return df.query(f"id == {parsed.tracking_id}").drop(columns=["id"])


def _batch_phases(df):
    smoothed = df.copy()
    for col in ["x", "y", "dx", "dy"]:
        smoothed[col] = smoothed[col].rolling(window=5, min_periods=1).mean()
    for col in ["norm_plate_height", "norm_plate_width"]:
        smoothed[col] = smoothed[col].expanding(min_periods=1).mean()
    return analyze_df(smoothed, 0.45)


@pytest.mark.parametrize("key", KEYS)
@pytest.mark.parametrize("chunk", [7, 64])
def test_streaming_matches_batch(reference_root, key, chunk):
    df = _load(reference_root, key)
    want = _batch_phases(df)

    stream = StreamingAnalyzer(plate_diameter=0.45)
    cols = ["time", "x", "y", "dy", "norm_plate_height", "norm_plate_width"]
    arrays = [df[c].to_numpy(np.float64) for c in cols]
    n = len(df)
    for i in range(0, n, chunk):
        stream.push_chunk(*(a[i : i + chunk] for a in arrays))
    got = stream.phases()

    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.type == w.type
        assert g.time_start == pytest.approx(w.time_start, rel=1e-9)
        assert g.time_end == pytest.approx(w.time_end, rel=1e-9)
        assert g.rom == pytest.approx(w.rom, rel=1e-9)


def test_streaming_phases_midway_monotone(reference_root):
    """phases() can be read at any point without disturbing the stream."""
    df = _load(reference_root, KEYS[0])
    stream = StreamingAnalyzer(plate_diameter=0.45)
    cols = ["time", "x", "y", "dy", "norm_plate_height", "norm_plate_width"]
    arrays = [df[c].to_numpy(np.float64) for c in cols]
    n = len(df)
    counts = []
    for i in range(0, n, n // 4):
        stream.push_chunk(*(a[i : i + n // 4] for a in arrays))
        counts.append(len(stream.phases()))
    want = _batch_phases(df)
    assert counts[-1] == len(want)
    assert counts[0] <= counts[-1]


def test_scan_smoother_matches_host_oracle():
    """The fused device smoother (analysis/smoother_scan.py) reproduces the
    host _CausalSmoother (plot.py rolling/expanding + shared-30-ring +
    dy-override semantics) sample for sample."""
    import jax
    import jax.numpy as jnp

    from vbt_tpu.analysis.smoother_scan import initial_smoother, smoother_step
    from vbt_tpu.runtime.streaming import _CausalSmoother

    rng = np.random.default_rng(7)
    n = 120
    xs = rng.uniform(0.2, 0.8, n)
    ys = rng.uniform(0.2, 0.8, n)
    dys = rng.normal(0, 0.01, n)
    hs = rng.uniform(0.1, 0.2, n)
    ws = rng.uniform(0.2, 0.3, n)

    host = _CausalSmoother()
    expected = np.array(
        [host.push(xs[i], ys[i], dys[i], hs[i], ws[i]) for i in range(n)]
    )

    carry = initial_smoother(jnp.float64)
    _, out = jax.lax.scan(
        smoother_step,
        carry,
        tuple(jnp.asarray(a, jnp.float64) for a in (xs, ys, dys, hs, ws)),
    )
    got = np.stack([np.asarray(o) for o in out], axis=1)
    np.testing.assert_allclose(got, expected, atol=1e-12)
