"""Driver-boundary test for __graft_entry__.dryrun_multichip.

Round 1's driver run failed (MULTICHIP_r01.json rc=1) because the dry run
inherited ``JAX_PLATFORMS=axon`` from the session and initialized the TPU
tunnel client instead of the virtual CPU mesh. This test invokes the hook
exactly the way the driver does — a fresh subprocess with the session's TPU
environment — and asserts it completes, proving the platform pinning inside
``dryrun_multichip`` holds regardless of inherited env.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_dryrun(env_overrides: dict, n: int = 8):
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    env.update(env_overrides)
    return subprocess.run(
        [
            sys.executable,
            "-c",
            f"import __graft_entry__ as g; g.dryrun_multichip({n}); print('DRYRUN_OK')",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )


def test_dryrun_multichip_in_process_smoke():
    """Default-lane guard for the driver hook: run the sharded train step on
    a 2-device mesh IN PROCESS (the conftest already pins an 8-CPU-device
    backend, so no subprocess respawn/compile duplication). The two slow
    variants below exercise the driver's exact subprocess environments."""
    import __graft_entry__ as g

    g.dryrun_multichip(2)


@pytest.mark.slow  # 52 s each; the in-process smoke above guards the hook in
# the default lane, the driver runs dryrun_multichip(8) every round
# (MULTICHIP_r0N.json), and the verify skill drives it before commits.
def test_dryrun_multichip_under_tpu_session_env():
    """Simulates the driver: JAX_PLATFORMS points at the TPU platform and
    XLA_FLAGS carries no host-device-count override."""
    env = {"JAX_PLATFORMS": "axon"}
    # Strip any force-count the test harness added; the hook must add its own.
    flags = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    result = _run_dryrun(env)
    assert result.returncode == 0, result.stderr[-4000:]
    assert "DRYRUN_OK" in result.stdout


@pytest.mark.slow  # see note on the session-env variant above
def test_dryrun_multichip_with_live_tpu_backend():
    """Simulates a driver process that already initialized a non-CPU backend
    before calling the hook (the exact round-1 failure mode). The hook must
    detect the live backend and re-exec in a pinned subprocess."""
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    env["JAX_PLATFORMS"] = "cpu"
    # A live CPU backend with only 1 device also forces the re-exec path.
    env["XLA_FLAGS"] = " ".join(
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    result = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; jax.devices();"  # initialize a 1-device backend first
            "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN_OK')",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    assert "DRYRUN_OK" in result.stdout
