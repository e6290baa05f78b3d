"""Fail-fast TPU health probe (vbt_tpu.utils.health).

The real degradation windows only occur on the live tunnel; these tests
exercise the machinery via the VBT_TPU_HEALTH_FAKE hook — including the
genuine subprocess-timeout kill path for the wedged mode — so every TPU
entry point's fail-fast guarantee is covered on CPU.
"""

import json
import os
import subprocess
import sys
import time

import pytest

from vbt_tpu.utils.health import (
    HealthReport,
    TPUUnhealthyError,
    probe_tpu,
    require_healthy_tpu,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cpu_platform_skips_probe(monkeypatch):
    monkeypatch.delenv("VBT_TPU_HEALTH_FAKE", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    rep = require_healthy_tpu()
    assert rep.ok and "skipped" in rep.reason


def test_opt_out_env(monkeypatch):
    monkeypatch.setenv("VBT_TPU_HEALTH_FAKE", "wedged")
    monkeypatch.setenv("VBT_TPU_HEALTH_PROBE", "0")
    assert require_healthy_tpu().ok


def test_fake_ok_passes(monkeypatch):
    monkeypatch.setenv("VBT_TPU_HEALTH_FAKE", "ok")
    rep = require_healthy_tpu()
    assert rep.ok and rep.forward_ms == 1.0


def test_fake_slow_is_degradation_window(monkeypatch):
    monkeypatch.setenv("VBT_TPU_HEALTH_FAKE", "slow")
    with pytest.raises(TPUUnhealthyError, match="degradation window"):
        require_healthy_tpu()


def test_wedged_tunnel_fails_within_deadline(monkeypatch):
    """The child really sleeps; the parent must kill it at the deadline."""
    monkeypatch.setenv("VBT_TPU_HEALTH_FAKE", "wedged")
    t0 = time.perf_counter()
    rep = probe_tpu(deadline_s=3.0)
    dt = time.perf_counter() - t0
    assert not rep.ok
    assert "wedged" in rep.reason
    assert dt < 30  # killed at the deadline, not hanging

    with pytest.raises(TPUUnhealthyError, match="wedged"):
        require_healthy_tpu(deadline_s=3.0, context="test")


def test_bench_emits_invalid_json_on_wedge():
    """bench.py must print one explicit invalid-JSON line and exit nonzero
    when the tunnel is wedged — never hang to an external timeout."""
    env = dict(os.environ)
    env["VBT_TPU_HEALTH_FAKE"] = "wedged"
    env["VBT_TPU_HEALTH_DEADLINE_S"] = "3"
    env["VBT_TPU_HEALTH_RETRY_S"] = "0"  # disable bench's retry window
    env["VBT_TPU_BENCH_RAW"] = "0"
    env["PYTHONPATH"] = REPO
    env.pop("VBT_TPU_HEALTH_PROBE", None)
    # JAX_PLATFORMS=cpu keeps the parent's module-level `import jax` off the
    # device; the fake hook still forces the probe to run and wedge.
    env["JAX_PLATFORMS"] = "cpu"
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=120,
    )
    dt = time.perf_counter() - t0
    assert proc.returncode == 1, proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["invalid"] is True
    assert out["value"] is None
    assert "wedged" in out["reason"] or "deadline" in out["reason"]
    assert dt < 300


def test_retry_window_recovers_from_transient(monkeypatch):
    """A transient degradation window must cost a re-probe, not the capture:
    with a retry window active, require_healthy_tpu keeps probing until the
    tunnel comes back (rounds 3 and 4 both lost their only driver BENCH
    capture to single-shot probes)."""
    from vbt_tpu.utils import health

    monkeypatch.setenv("VBT_TPU_HEALTH_FAKE", "slow")  # defeat the CPU skip
    monkeypatch.setattr(health, "RETRY_SLEEP_S", 0.01)
    calls = {"n": 0}

    def fake_probe(deadline_s=None, slow_ms=None):
        calls["n"] += 1
        if calls["n"] < 3:
            return HealthReport(ok=False, reason="TPU degradation window")
        return HealthReport(ok=True, reason="healthy", forward_ms=6.0)

    monkeypatch.setattr(health, "probe_tpu", fake_probe)
    rep = health.require_healthy_tpu(retry_window_s=30.0)
    assert rep.ok and calls["n"] == 3


def test_retry_window_gives_up(monkeypatch):
    from vbt_tpu.utils import health

    monkeypatch.setenv("VBT_TPU_HEALTH_FAKE", "slow")
    monkeypatch.setattr(health, "RETRY_SLEEP_S", 0.01)
    monkeypatch.setattr(
        health, "probe_tpu",
        lambda deadline_s=None, slow_ms=None: HealthReport(
            ok=False, reason="TPU degradation window"),
    )
    t0 = time.perf_counter()
    with pytest.raises(TPUUnhealthyError, match="gave up after"):
        health.require_healthy_tpu(retry_window_s=0.2)
    assert time.perf_counter() - t0 < 10


def test_no_retry_by_default(monkeypatch):
    """Interactive CLIs stay fail-fast: one probe, no retry loop."""
    from vbt_tpu.utils import health

    monkeypatch.setenv("VBT_TPU_HEALTH_FAKE", "slow")
    monkeypatch.delenv("VBT_TPU_HEALTH_RETRY_S", raising=False)
    calls = {"n": 0}

    def fake_probe(deadline_s=None, slow_ms=None):
        calls["n"] += 1
        return HealthReport(ok=False, reason="TPU degradation window")

    monkeypatch.setattr(health, "probe_tpu", fake_probe)
    with pytest.raises(TPUUnhealthyError):
        health.require_healthy_tpu()
    assert calls["n"] == 1


def test_report_dataclass():
    rep = HealthReport(ok=True, reason="healthy", forward_ms=6.2)
    assert rep.forward_ms < 60


def test_small_retry_window_reports_no_retry(monkeypatch):
    """A window below the retry cycle performs no retries and SAYS so."""
    from vbt_tpu.utils import health

    monkeypatch.setenv("VBT_TPU_HEALTH_FAKE", "slow")

    def fake_probe(deadline_s=None, slow_ms=None):
        return HealthReport(ok=False, reason="TPU degradation window")

    monkeypatch.setattr(health, "probe_tpu", fake_probe)
    with pytest.raises(TPUUnhealthyError, match="too small for"):
        health.require_healthy_tpu(retry_window_s=30)


def test_host_keyed_cpu_cache_scopes_and_restores(monkeypatch, tmp_path):
    """CPU compiles from an accelerator-platform process land in the
    host-keyed subdir; the shared TPU dir is restored afterwards."""
    import jax

    from vbt_tpu.utils import cache

    orig = jax.config.jax_compilation_cache_dir
    top = str(tmp_path / "xla")
    jax.config.update("jax_compilation_cache_dir", top)
    try:
        monkeypatch.setattr(cache, "_platform_is_cpu", lambda: False)
        with cache.host_keyed_cpu_cache():
            inner = jax.config.jax_compilation_cache_dir
            assert inner.startswith(top) and "host-" in inner
        assert jax.config.jax_compilation_cache_dir == top
        # No-op when the process platform is CPU (dir already host-keyed
        # by enable_persistent_cache).
        monkeypatch.setattr(cache, "_platform_is_cpu", lambda: True)
        with cache.host_keyed_cpu_cache():
            assert jax.config.jax_compilation_cache_dir == top
    finally:
        jax.config.update("jax_compilation_cache_dir", orig)
