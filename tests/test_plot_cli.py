"""plot CLI end-to-end: figure rendering + phase metrics on golden inputs."""

import json
import os

import matplotlib
import pytest

matplotlib.use("Agg")

from click.testing import CliRunner

from vbt_tpu.cli import plot as plot_cli

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_phases.json")
KEY = "dfs/001_squat_6reps_id1_efficientdet_lite0_whole.pkl.gz"

with open(FIXTURE) as f:
    ORACLE = json.load(f)


@pytest.mark.parametrize("engine", ["host", "jax"])
def test_plot_one_produces_golden_phases(reference_root, tmp_path, engine):
    src = str(reference_root / KEY)
    phases = plot_cli.plot_one(
        src, show_fig=False, save_fig=True, plate_diameter=0.45,
        fig_dir=str(tmp_path), engine=engine,
    )
    want = ORACLE[KEY]
    assert len(phases) == len(want)
    for got, exp in zip(phases, want):
        assert got.type == exp["type"]
        assert got.time_start == pytest.approx(exp["time_start"], rel=1e-9)
        assert got.rom == pytest.approx(exp["rom"], rel=1e-9)
    pdfs = list(tmp_path.glob("*.pdf"))
    assert len(pdfs) == 1
    assert pdfs[0].name == "001_squat_6reps_id1_efficientdet_lite0_whole.pdf"


def test_plot_cli_rejects_missing_file():
    runner = CliRunner()
    result = runner.invoke(plot_cli.main, ["/nonexistent.pkl.gz"])
    assert result.exit_code != 0


def test_plot_cli_skips_bad_filename(tmp_path, reference_root, capsys):
    # A pickle whose name doesn't match the grammar is skipped with a message
    # (plot.py:83-85 behaviour).
    import shutil

    bad = tmp_path / "badname.pkl.gz"
    shutil.copy(reference_root / KEY, bad)
    runner = CliRunner()
    result = runner.invoke(plot_cli.main, [str(bad)], catch_exceptions=False)
    assert result.exit_code == 0
    assert "Couldn't create a plot" in result.output
