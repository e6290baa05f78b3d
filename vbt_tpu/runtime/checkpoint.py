"""Model parameter checkpointing.

The reference's only model artifact is an exported .tflite binary
(train.py:67); here model variables (params + batch stats) serialize through
flax's msgpack format. Training checkpoints use a hand-rolled directory
layout — step-numbered msgpack files plus a LATEST marker — kept deliberately
simple (SURVEY.md §5 "Checkpoint / resume"); no orbax dependency.
"""

from __future__ import annotations

import os
from typing import Any

import flax.serialization


def save_params(path: str, variables: Any) -> None:
    """Serialize a flax variable collection to a single msgpack file."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))


def load_params(path: str, template: Any) -> Any:
    """Load variables saved by :func:`save_params` into ``template``'s
    structure (shapes/dtypes validated by flax)."""
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def save_train_checkpoint(ckpt_dir: str, step: int, state: Any) -> None:
    """Mid-training checkpoint (step-numbered msgpack + LATEST marker).

    Adds the checkpoint/resume capability the reference lacks (SURVEY.md §5:
    training wrote only the final artifact)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step:08d}.msgpack")
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    with open(os.path.join(ckpt_dir, "LATEST"), "w") as f:
        f.write(f"{step}\n")


def latest_train_checkpoint(ckpt_dir: str) -> int | None:
    marker = os.path.join(ckpt_dir, "LATEST")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return int(f.read().strip())


def load_train_checkpoint(ckpt_dir: str, step: int, template: Any) -> Any:
    path = os.path.join(ckpt_dir, f"step_{step:08d}.msgpack")
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())
