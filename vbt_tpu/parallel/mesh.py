"""Mesh construction and common shardings.

Idiomatic JAX SPMD: build a Mesh, annotate data with NamedSharding, jit —
XLA lays the all-reduces onto ICI (SURVEY.md §2.2's TPU-native mapping).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    n_devices: int | None = None, model_parallel: int = 1, devices=None
) -> Mesh:
    """A ('data', 'model') mesh; model axis is 1 by default (lite-size
    models need no tensor parallelism — SURVEY.md §2.2)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    data = len(devices) // model_parallel
    grid = devices[: data * model_parallel].reshape(data, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, PartitionSpec("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
