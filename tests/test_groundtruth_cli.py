"""Kinovea / Qualisys validation CLI parity vs the reference-output oracle."""

import json
import os
import re

import matplotlib
import pytest

matplotlib.use("Agg")

from click.testing import CliRunner

from vbt_tpu.cli import kinovea as kinovea_cli
from vbt_tpu.cli import qualisys as qualisys_cli
from vbt_tpu.cli._groundtruth import run_validation

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "groundtruth_metrics.json")

with open(FIXTURE) as f:
    ORACLE = json.load(f)


def test_kinovea_metrics_match_reference(reference_root, tmp_path):
    results = run_validation(
        str(reference_root / "kinovea_exports"),
        str(reference_root / "dfs"),
        show_fig=False,
        fig_dir=str(tmp_path),
        plate_diameter=0.45,
        cfg=kinovea_cli.CONFIG,
    )
    rows = ORACLE["kinovea"]["rows"]
    assert len(results) == len(rows) == 32
    for r in results:
        want = rows[r.video]
        assert r.mse_x == pytest.approx(want["mse_x"], abs=5e-5)
        assert r.mse_y == pytest.approx(want["mse_y"], abs=5e-5)
        assert r.r_x == pytest.approx(want["r_x"], abs=5e-5)
        assert r.r_y == pytest.approx(want["r_y"], abs=5e-5)
    total_x = sum(r.mse_x for r in results)
    total_y = sum(r.mse_y for r in results)
    assert total_x == pytest.approx(ORACLE["kinovea"]["total_mse_x"], rel=1e-6)
    assert total_y == pytest.approx(ORACLE["kinovea"]["total_mse_y"], rel=1e-6)
    # One overlay PDF per clip.
    assert len(list(tmp_path.glob("*.pdf"))) == 32


def test_qualisys_metrics_match_reference(reference_root, tmp_path):
    results = run_validation(
        str(reference_root / "qualysis_exports"),
        str(reference_root / "qualysis_dfs"),
        show_fig=False,
        fig_dir=str(tmp_path),
        plate_diameter=0.45,
        cfg=qualisys_cli.CONFIG,
    )
    rows = ORACLE["qualisys"]["rows"]
    assert len(results) == len(rows) == 5
    for r in results:
        want = rows[r.video]
        assert r.mse_x == pytest.approx(want["mse_x"], abs=5e-5)
        assert r.mse_y == pytest.approx(want["mse_y"], abs=5e-5)
        assert r.r_x == pytest.approx(want["r_x"], abs=5e-5)
        assert r.r_y == pytest.approx(want["r_y"], abs=5e-5)


def test_kinovea_cli_end_to_end(reference_root, tmp_path):
    runner = CliRunner()
    result = runner.invoke(
        kinovea_cli.main,
        [
            "--kinovea_dir", str(reference_root / "kinovea_exports"),
            "--df_dir", str(reference_root / "dfs"),
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    assert re.search(r"Total MSEx = [0-9.]+, MSEy = [0-9.]+", result.output)
    assert "\\texttt{001\\_squat\\_6reps}" in result.output
    assert "$r_x$" in result.output
