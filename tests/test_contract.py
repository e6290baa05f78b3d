"""Contract-layer tests against the reference's committed golden artifacts."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from vbt_tpu.contract import (
    TRACK_COLUMNS,
    build_df_filename,
    build_track_df,
    compare_track_dfs,
    max_travel_id,
    parse_df_filename,
    read_kinovea_export,
    read_qualisys_export,
    read_voc_annotations,
    validate_track_df,
)


def _golden_paths(reference_root, subdir="dfs"):
    paths = sorted(glob.glob(str(reference_root / subdir / "*.pkl.gz")))
    return [p for p in paths if "eval_detections" not in p]


def test_filename_roundtrip():
    name = build_df_filename("/videos/001_squat_6reps.mp4", 1, "models/efficientdet_lite0_whole.tflite")
    assert name == "001_squat_6reps_id1_efficientdet_lite0_whole.pkl.gz"
    parsed = parse_df_filename("/any/dir/" + name)
    assert parsed.video == "001_squat_6reps"
    assert parsed.tracking_id == 1
    assert parsed.model == "efficientdet_lite0_whole"


def test_filename_parse_rejects_garbage():
    assert parse_df_filename("notadataframe.txt") is None
    assert parse_df_filename("missing_id_field.pkl.gz") is None


def test_golden_dfs_conform_to_schema(reference_root):
    paths = _golden_paths(reference_root)
    assert len(paths) == 34
    for p in paths[:5]:
        df = pd.read_pickle(p)
        assert validate_track_df(df) == []


def test_max_travel_id_matches_golden_filenames(reference_root):
    # The filename embeds the id with max cumulative travel (track.py:108-118);
    # recomputing it from the pickle contents must reproduce the filename.
    for p in _golden_paths(reference_root):
        df = pd.read_pickle(p)
        parsed = parse_df_filename(p)
        assert max_travel_id(df) == parsed.tracking_id, p


def test_ocsort_golden_ids_are_stable(reference_root):
    for p in _golden_paths(reference_root, "dfs_ocsort"):
        assert parse_df_filename(p).tracking_id == 1


def test_build_track_df_preserves_insertion_index():
    data = {
        "id": [2, 1, 2, 1],
        "time": [0.1, 0.1, 0.2, 0.2],
        "x": [0.0, 1.0, 2.0, 3.0],
        "y": [0.0, 1.0, 2.0, 3.0],
        "dx": [0.0] * 4,
        "dy": [0.0] * 4,
        "norm_plate_height": [0.1] * 4,
        "norm_plate_width": [0.2] * 4,
    }
    df = build_track_df(data)
    assert list(df.index) == [1, 3, 0, 2]  # sorted by (id, time), index kept
    assert tuple(df.columns) == TRACK_COLUMNS
    assert validate_track_df(df) == []


def test_compare_track_dfs_detects_perturbation(reference_root):
    p = _golden_paths(reference_root)[0]
    golden = pd.read_pickle(p)
    assert compare_track_dfs(golden, golden.copy()).equal
    perturbed = golden.copy()
    perturbed.loc[perturbed.index[0], "x"] += 1e-3
    cmp = compare_track_dfs(golden, perturbed)
    assert not cmp.equal
    assert any("x" in s for s in cmp.problems)


def test_kinovea_parser(reference_root):
    files = sorted(glob.glob(str(reference_root / "kinovea_exports" / "*.txt")))
    assert len(files) == 32
    df = read_kinovea_export(files[0])
    assert list(df.columns) == ["time", "x", "y"]
    assert len(df) > 100
    # metres: barbell trajectories move on the order of 0.1-2 m.
    assert df["y"].abs().max() < 10.0
    assert np.issubdtype(df["x"].dtype, np.floating)


def test_qualisys_parser(reference_root):
    files = sorted(glob.glob(str(reference_root / "qualysis_exports" / "*.tsv")))
    assert len(files) == 5
    df = read_qualisys_export(files[0])
    assert list(df.columns) == ["time", "x", "y"]
    # 100 Hz capture (SURVEY.md §0)
    dt = np.diff(df["time"].to_numpy()[:50])
    assert np.allclose(dt, 0.01, atol=1e-6)
    assert df["y"].abs().max() < 10.0


def test_voc_parser(reference_root):
    annotations = read_voc_annotations(str(reference_root / "data" / "test"))
    assert len(annotations) == 61
    for fname, boxes in annotations.items():
        assert fname.endswith(".jpg")
        assert boxes.ndim == 2 and boxes.shape[1] == 4
        if len(boxes):
            ymin, xmin, ymax, xmax = boxes[0]
            assert ymax > ymin and xmax > xmin
