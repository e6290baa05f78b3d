"""Persistent XLA compilation cache.

TPU compiles of the full detector (and especially its backward pass) take
minutes; enabling JAX's persistent cache makes every CLI invocation after
the first start in seconds. Called by all vbt CLIs and bench.py.
"""

from __future__ import annotations

import contextlib
import os

DEFAULT_DIR = os.path.expanduser("~/.cache/vbt_tpu_xla")


def _host_cpu_key() -> str:
    """Short key identifying this host's CPU feature set.

    XLA:CPU AOT executables are compiled for the build host's exact machine
    type; loading one on a host with different CPU features logs
    "machine type doesn't match" errors and risks SIGILL (seen in the
    MULTICHIP_r04 dryrun tail, where the shared cache dir outlived the
    host). Keying the CPU cache dir by the feature set makes a host change
    a clean cold miss instead.
    """
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    digest = hashlib.sha1(
        (platform.machine() + "|" + feats).encode()
    ).hexdigest()[:12]
    return f"host-{platform.machine()}-{digest}"


def _platform_is_cpu() -> bool:
    """True when this process is pinned to the CPU backend (env var or
    jax config — tests set the config; see tests/conftest.py). The single
    shared implementation: utils.health imports this one."""
    env = os.environ.get("JAX_PLATFORMS", "")
    if "cpu" in env.lower():
        return True
    try:
        import jax

        cfg = jax.config.jax_platforms or ""
        return "cpu" in cfg.lower()
    except Exception:
        return False


@contextlib.contextmanager
def host_keyed_cpu_cache():
    """Scope compiles to the host-keyed cache subdir for a block that
    compiles CPU executables from an accelerator-platform process (e.g.
    track_one's host-pinned tracker scan under axon).

    CPU AOT artifacts are host-feature-specific (see ``_host_cpu_key``),
    but the top-level dir must stay host-agnostic: it holds the remotely
    compiled TPU executables that every host can share. No-op when the
    whole process is already CPU (the dir is host-keyed at enable time)
    or when no persistent cache is configured."""
    import jax

    prev = jax.config.jax_compilation_cache_dir
    if _platform_is_cpu() or not prev or os.path.basename(prev).startswith("host-"):
        yield
        return
    sub = os.path.join(prev, _host_cpu_key())
    os.makedirs(sub, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", sub)
    try:
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("VBT_XLA_CACHE_DIR", DEFAULT_DIR)
    if _platform_is_cpu():
        # CPU AOT artifacts are host-feature-specific (see _host_cpu_key);
        # TPU executables compile remotely and stay in the top-level dir.
        cache_dir = os.path.join(cache_dir, _host_cpu_key())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
