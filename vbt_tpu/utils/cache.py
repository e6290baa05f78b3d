"""Persistent XLA compilation cache.

TPU compiles of the full detector (and especially its backward pass) take
minutes; enabling JAX's persistent cache makes every CLI invocation after
the first start in seconds. Called by all vbt CLIs and bench.py.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/vbt_tpu_xla")


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("VBT_XLA_CACHE_DIR", DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
