"""eval CLI: matching parity vs the reference function + golden-df curves."""

import os
import sys

import matplotlib
import numpy as np
import pandas as pd
import pytest

matplotlib.use("Agg")

from click.testing import CliRunner

from vbt_tpu.cli import eval as eval_cli


def test_match_bboxes_matches_reference_function(reference_root):
    """Fuzz against the reference's own match_bboxes (executed, not copied)."""
    import importlib
    import types

    # The reference module imports tflite_runtime at import time; stub it —
    # match_bboxes itself is pure numpy/scipy.
    if "tflite_runtime" not in sys.modules:
        stub = types.ModuleType("tflite_runtime")
        interp = types.ModuleType("tflite_runtime.interpreter")
        interp.Interpreter = object
        stub.interpreter = interp
        sys.modules["tflite_runtime"] = stub
        sys.modules["tflite_runtime.interpreter"] = interp
    sys.path.insert(0, str(reference_root))
    try:
        ref_eval = importlib.import_module("eval")
    finally:
        sys.path.remove(str(reference_root))

    rng = np.random.default_rng(11)
    for _ in range(30):
        n_gt = int(rng.integers(0, 5))
        n_det = int(rng.integers(1, 30))
        gt = np.sort(rng.integers(0, 300, size=(n_gt, 2, 2)), axis=1).reshape(-1, 4)
        gt = gt[:, [0, 2, 1, 3]]  # [ymin, xmin, ymax, xmax]
        det = np.sort(rng.integers(0, 300, size=(n_det, 2, 2)), axis=1).reshape(-1, 4)
        det = det[:, [0, 2, 1, 3]]
        if n_gt == 0:
            continue  # the reference function requires >= 1 GT row
        got_gt, got_det, got_iou = eval_cli.match_bboxes(gt, det)
        want_gt, want_det, want_iou = ref_eval.match_bboxes(gt, det)
        # Assignments may permute among ties; total matched IoU must agree
        # and the per-detection IoU multiset must match.
        assert got_iou.sum() == pytest.approx(want_iou.sum(), abs=1e-9)
        np.testing.assert_allclose(np.sort(got_iou), np.sort(want_iou), atol=1e-12)
        assert len(got_det) == len(want_det)


def test_scaled_bbox():
    box = np.array([0.5, 0.25, 1.0, 0.75])
    out = eval_cli.scaled_bbox(box, (1, 1), (200, 400))
    np.testing.assert_array_equal(out, [100, 100, 200, 300])


def test_curves_from_golden_detections(reference_root, tmp_path):
    """PR/ROC figure generation over the reference's cached detections —
    APs must reproduce the published baselines (BASELINE.md)."""
    df = pd.read_pickle(reference_root / "dfs" / "eval_detections.pkl.gz")
    df["Label"] = df["IoU"] > 0.75
    aps = eval_cli.plot_precision_recall(df.copy(), str(tmp_path), 0.75)
    aucs = eval_cli.plot_roc(df.copy(), str(tmp_path), 0.75)
    assert os.path.exists(tmp_path / "precision_recall_iou_0.75.pdf")
    assert os.path.exists(tmp_path / "roc_iou_0.75.pdf")
    assert set(aps) == set(aucs)
    assert len(aps) == 6
    # Sanity: the 'whole' fine-tunes dominate their heads-only versions.
    assert aps["efficientdet_lite0_whole"] > aps["efficientdet_lite0"]
    assert aps["efficientdet_lite1_whole"] > aps["efficientdet_lite1"]


def test_eval_cli_uses_cached_detections(reference_root, tmp_path):
    runner = CliRunner()
    result = runner.invoke(
        eval_cli.main,
        [
            "--img_dir", str(reference_root / "data" / "test"),
            "--annotations_dir", str(reference_root / "data" / "test"),
            "--detections_df", str(reference_root / "dfs" / "eval_detections.pkl.gz"),
            "--fig_dir", str(tmp_path),
            "--iou_threshold", "0.5",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    assert "Loading dataframe" in result.output
    assert (tmp_path / "precision_recall_iou_0.5.pdf").exists()
    assert (tmp_path / "roc_iou_0.5.pdf").exists()
