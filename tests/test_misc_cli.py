"""data_prep and training_plot CLI behaviour."""

import numpy as np

from vbt_tpu.cli.data_prep import split_files
from vbt_tpu.cli.training_plot import parse_logs


def test_split_percentages():
    files = [f"img{i}" for i in range(100)]
    parts = split_files(files, np.random.default_rng(0))
    assert len(parts["train"]) == 85
    assert len(parts["test"]) == 5
    assert len(parts["valid"]) == 10
    # train/test disjoint (valid may overlap train, matching the reference's
    # tail-slice behaviour).
    assert not set(parts["train"]) & set(parts["test"])


def test_parse_logs_reference_format(reference_root):
    losses = parse_logs(str(reference_root / "models"))
    assert len(losses) == 5
    assert all(len(v) == 50 for v in losses.values())  # 50 epochs each
    assert 0 < losses["efficientdet_lite0_whole"][-1] < 1.0
