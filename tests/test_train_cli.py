"""train CLI smoke on a tiny slice of the real dataset (CPU) + checkpointing."""

import os
import re
import shutil

import numpy as np
import pytest

from vbt_tpu.models import get_model_spec
from vbt_tpu.runtime.checkpoint import (
    latest_train_checkpoint,
    load_train_checkpoint,
    save_train_checkpoint,
)
from vbt_tpu.train.train_step import Trainer


@pytest.fixture()
def tiny_data(reference_root, tmp_path):
    """A 12-image train / 4-valid / 4-test copy of the real dataset."""
    import glob

    for part, n in [("train", 12), ("valid", 4), ("test", 4)]:
        src = reference_root / "data" / ("train" if part == "train" else part)
        os.makedirs(tmp_path / part)
        xmls = sorted(glob.glob(str(src / "*.xml")))[:n]
        for x in xmls:
            stem = os.path.basename(x)[:-4]
            shutil.copy(x, tmp_path / part / f"{stem}.xml")
            shutil.copy(str(src / f"{stem}.jpg"), tmp_path / part / f"{stem}.jpg")
    return str(tmp_path)


def test_train_model_smoke(tiny_data, tmp_path):
    from vbt_tpu.cli.train import train_model

    logs = []
    trainer, state, val_losses = train_model(
        "efficientdet_lite0", tiny_data, str(tmp_path), epochs=2, batch_size=4,
        train_whole_model=True, base_lr=0.01, max_steps=4, log_fn=logs.append,
        input_size=128,
    )
    assert int(state.step) == 4
    assert len(val_losses) >= 1 and np.isfinite(val_losses[0])
    assert any(re.search(r"val_loss: \d+\.\d+", line) for line in logs)


def test_heads_only_freezes_backbone(tiny_data, tmp_path):
    """--heads_only loads the _whole donor, trains heads, keeps backbone+fpn
    bit-frozen (reference train.py:24 train_whole_model=False semantics)."""
    from vbt_tpu.cli.train import train_model
    from vbt_tpu.runtime.checkpoint import save_params

    donor_trainer = Trainer(get_model_spec("efficientdet_lite0"),
                            total_steps=10, warmup_steps=1, input_size=128)
    donor_state = donor_trainer.init_state(seed=7)
    donor_vars = donor_trainer.variables(donor_state)
    save_params(str(tmp_path / "efficientdet_lite0_whole.msgpack"), donor_vars)

    logs = []
    trainer, state, _ = train_model(
        "efficientdet_lite0", tiny_data, str(tmp_path), epochs=1, batch_size=4,
        train_whole_model=False, base_lr=0.01, max_steps=2, log_fn=logs.append,
        input_size=128,
    )
    assert any("Heads-only" in line for line in logs)
    donor_np = np.asarray(donor_vars["params"]["backbone"]["stem"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(state.params["backbone"]["stem"]["kernel"]), donor_np)
    for sub in ("backbone", "fpn"):
        import jax

        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            state.params[sub], donor_vars["params"][sub])
    # Heads actually trained (init differs from donor seed anyway; assert
    # they moved from *their own* init under the optimizer).
    init_state = trainer.init_state(seed=0)
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
        state.params["class_net"], init_state.params["class_net"]))
    assert any(moved)


@pytest.mark.slow  # 27 s; train_model_smoke + heads_only cover the CLI body
# in the default lane, this pins only the --init_from seeding semantics.
def test_init_from_warm_start(tiny_data, tmp_path):
    """--init_from seeds params+batch_stats from an exported msgpack with a
    fresh optimizer (soup fine-tune entry point)."""
    from vbt_tpu.cli.train import train_model
    from vbt_tpu.runtime.checkpoint import save_params

    donor_trainer = Trainer(get_model_spec("efficientdet_lite0"),
                            total_steps=10, warmup_steps=1, input_size=128)
    donor_vars = donor_trainer.variables(donor_trainer.init_state(seed=11))
    donor_path = str(tmp_path / "soup.msgpack")
    save_params(donor_path, donor_vars)

    logs = []
    _, state, _ = train_model(
        "efficientdet_lite0", tiny_data, str(tmp_path), epochs=1, batch_size=4,
        train_whole_model=True, base_lr=0.0, max_steps=1, log_fn=logs.append,
        input_size=128, init_from=donor_path,
    )
    assert any("Warm start" in line for line in logs)
    # lr=0 => params must still equal the donor after the step.
    np.testing.assert_array_equal(
        np.asarray(state.params["backbone"]["stem"]["kernel"]),
        np.asarray(donor_vars["params"]["backbone"]["stem"]["kernel"]))


def test_heads_only_missing_donor_raises(tiny_data, tmp_path, monkeypatch):
    from vbt_tpu.cli.train import train_model

    real_isfile = os.path.isfile
    monkeypatch.setattr(  # hide the shipped repo donors
        "os.path.isfile",
        lambda p: False if str(p).endswith("_whole.msgpack") else real_isfile(p),
    )
    with pytest.raises(FileNotFoundError, match="donor backbone"):
        train_model(
            "efficientdet_lite2", tiny_data, str(tmp_path / "empty"), epochs=1,
            batch_size=4, train_whole_model=False, max_steps=1,
            input_size=128,
        )


def test_checkpoint_roundtrip(tmp_path):
    trainer = Trainer(get_model_spec("efficientdet_lite0"), total_steps=10,
                      warmup_steps=1, input_size=128)
    state = trainer.init_state(seed=0)
    save_train_checkpoint(str(tmp_path), 3, state)
    assert latest_train_checkpoint(str(tmp_path)) == 3
    restored = load_train_checkpoint(str(tmp_path), 3, state)
    np.testing.assert_array_equal(
        np.asarray(restored.params["backbone"]["stem"]["kernel"]),
        np.asarray(state.params["backbone"]["stem"]["kernel"]),
    )
