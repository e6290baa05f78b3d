"""Fail-fast TPU health probe — degradation-window resilience for every CLI.

The axon dev tunnel has documented failure modes (CLAUDE.md): execution can
degrade 10-55x (forward 6 ms -> 300 ms), wedge entirely (a tiny op hangs for
minutes), or — when the tunnel is fully dead — hang every *new* python
process at interpreter startup. A wedged device call cannot be interrupted
from inside the process, so the probe runs in a SUBPROCESS with a hard wall
deadline: the parent either gets a verdict within ``deadline_s`` seconds or
kills the child and reports the tunnel as wedged.

Every TPU entry point (bench.py, track/eval/stream/train CLIs) calls
:func:`require_healthy_tpu` BEFORE touching the device in-process, so a dead
tunnel produces a clear diagnostic in ~2 minutes instead of an indefinite
hang deep inside a compile or a readback (round 3 lost its benchmark capture
exactly this way: BENCH_r03.json rc=124 after two silent 900 s timeouts).

Probe content (same playbook the round-3 training watcher used):
1. a tiny bf16 matmul with a forced host readback — catches a fully wedged
   tunnel;
2. a real jitted EfficientDet-Lite0 bf16 forward at batch 128 (random init,
   persistent-cache-backed so reruns skip the remote compile), timed by the
   marginal short/long-run method from bench.py — catches the "tiny ops fine,
   real graphs 10-55x slow" degradation mode.

Healthy = marginal forward < ``slow_ms`` (default 60 ms; a healthy v5e does
~6 ms, a degraded window ~300 ms, so the separator is wide on both sides).

Test hook: ``VBT_TPU_HEALTH_FAKE=ok|wedged|slow`` replaces the probe body in
the child process (``wedged`` sleeps past the deadline, genuinely exercising
the subprocess-timeout kill path). ``VBT_TPU_HEALTH_PROBE=0`` disables
probing entirely (for a caller that has just probed).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from dataclasses import dataclass

from vbt_tpu.utils.cache import _platform_is_cpu  # single shared detector

# Marginal forward latency above this is a degradation window, not a healthy
# chip (healthy ~6 ms at batch 128; degraded windows measured 60-300 ms+).
SLOW_MS = 60.0
# Wall deadline for the whole probe subprocess. Generous enough for a cold
# remote compile of the lite0 forward (~40-90 s observed); a wedged tunnel
# blows through it and gets killed.
DEADLINE_S = 240.0

_PROBE_SRC = r"""
import os, sys, time

fake = os.environ.get("VBT_TPU_HEALTH_FAKE", "")
if fake == "ok":
    print("HEALTH ok fwd_ms=1.0 (faked)")
    sys.exit(0)
if fake == "wedged":
    time.sleep(3600)  # simulate a wedged tunnel: parent must kill us
if fake == "slow":
    print("HEALTH ok fwd_ms=500.0 (faked)")
    sys.exit(0)

import jax, jax.numpy as jnp, numpy as np
from vbt_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

# 1. tiny op: catches a fully wedged tunnel before paying any compile.
x = jnp.ones((128, 128), jnp.bfloat16)
v = float(np.asarray((x @ x).sum(), np.float32))
assert v > 0

# 2. real forward graph at the bench's operating point (b128 bf16), timed
#    marginally so the ~27 ms fixed tunnel sync cancels out.
from vbt_tpu.models import get_model_spec
from vbt_tpu.runtime.pipeline import DetectionPipeline
spec = get_model_spec("efficientdet_lite0")
pipe = DetectionPipeline(
    spec=spec,
    variables=DetectionPipeline.init_variables(spec, dtype=jnp.bfloat16),
    use_pallas=True, dtype=jnp.bfloat16,
)
rng = np.random.default_rng(0)
f = jnp.asarray(rng.integers(0, 255, size=(128, 320, 320, 3)), jnp.uint8)

def run(n):
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = pipe._forward(pipe.variables, f)
    float(np.asarray(out[1]).ravel()[0])  # forced readback
    return time.perf_counter() - t0

run(2)  # warmup / compile (persistent-cache hit on reruns)
ms = (run(12) - run(4)) / 8 * 1e3
print(f"HEALTH ok fwd_ms={ms:.2f}")
"""


class TPUUnhealthyError(RuntimeError):
    """The TPU tunnel is wedged or in a degradation window."""


@dataclass
class HealthReport:
    ok: bool
    reason: str
    forward_ms: float | None = None




def probe_tpu(deadline_s: float | None = None, slow_ms: float = SLOW_MS) -> HealthReport:
    """Probe the device from a subprocess with a hard wall deadline.

    ``deadline_s`` defaults to ``VBT_TPU_HEALTH_DEADLINE_S`` (else
    ``DEADLINE_S``) so callers that can't thread the parameter — bench.py
    under the driver, tests — can still tighten it.
    """
    if deadline_s is None:
        deadline_s = float(os.environ.get("VBT_TPU_HEALTH_DEADLINE_S", DEADLINE_S))
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            env=env, capture_output=True, text=True, timeout=deadline_s,
        )
    except subprocess.TimeoutExpired:
        return HealthReport(
            ok=False,
            reason=(
                f"TPU health probe exceeded its {deadline_s:.0f}s deadline — "
                "the tunnel is wedged or fully dead (CLAUDE.md degradation "
                "playbook). Retry later; CPU-only work can run with "
                "PYTHONPATH= JAX_PLATFORMS=cpu."
            ),
        )
    out = proc.stdout or ""
    if proc.returncode != 0 or "HEALTH ok" not in out:
        tail = (proc.stderr or out).strip().splitlines()[-3:]
        return HealthReport(
            ok=False,
            reason="TPU health probe failed: " + (" | ".join(tail) or "no output"),
        )
    fwd_ms = None
    for tok in out.split():
        if tok.startswith("fwd_ms="):
            fwd_ms = float(tok.split("=", 1)[1])
    if fwd_ms is not None and fwd_ms > slow_ms:
        return HealthReport(
            ok=False, forward_ms=fwd_ms,
            reason=(
                f"TPU degradation window: marginal lite0 forward is "
                f"{fwd_ms:.1f} ms/b128 (healthy ~6 ms, threshold {slow_ms:.0f}). "
                "Timing and throughput measured now would be garbage."
            ),
        )
    return HealthReport(ok=True, reason="healthy", forward_ms=fwd_ms)


# Pause between probe attempts when a retry window is active. Each probe
# already costs up to DEADLINE_S, so the effective re-check cadence is
# ~(probe time + RETRY_SLEEP_S) — about every 5 minutes on a wedged tunnel.
RETRY_SLEEP_S = 120.0


def require_healthy_tpu(
    deadline_s: float | None = None,
    slow_ms: float = SLOW_MS,
    context: str = "",
    retry_window_s: float | None = None,
) -> HealthReport:
    """Raise :class:`TPUUnhealthyError` unless the device is serving sanely.

    No-op on CPU backends (tests, golden lanes) and when
    ``VBT_TPU_HEALTH_PROBE=0``.

    ``retry_window_s`` keeps re-probing a failing tunnel for that many
    seconds before giving up (env override: ``VBT_TPU_HEALTH_RETRY_S``).
    The loop only retries while the window still has room for a full
    sleep (``RETRY_SLEEP_S``) plus probe — this deliberately leaves the
    tail of the window for the caller's own work (bench must fit its
    measurement inside the driver's kill deadline) — so windows shorter
    than ~``RETRY_SLEEP_S`` perform no retries; the error says so.
    The axon tunnel's degradation windows are often transient, and for an
    unattended capture (the driver runs bench.py exactly once per round) a
    single-shot probe turns a 10-minute hiccup into a lost round — rounds
    3 and 4 both lost their only BENCH capture this way. Interactive CLIs
    keep the fail-fast default (0 = no retry).
    """
    if os.environ.get("VBT_TPU_HEALTH_PROBE", "1") == "0" or (
        _platform_is_cpu() and not os.environ.get("VBT_TPU_HEALTH_FAKE")
    ):
        return HealthReport(ok=True, reason="probe skipped")
    if retry_window_s is None:
        retry_window_s = float(os.environ.get("VBT_TPU_HEALTH_RETRY_S", "0"))
    prefix = f"[{context}] " if context else ""
    t_start = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        rep = probe_tpu(deadline_s=deadline_s, slow_ms=slow_ms)
        if rep.ok:
            return rep
        remaining = retry_window_s - (time.monotonic() - t_start)
        if remaining <= RETRY_SLEEP_S:
            if attempt > 1:
                tail = (
                    f" (gave up after {attempt} probe attempts over "
                    f"{time.monotonic() - t_start:.0f}s)"
                )
            elif retry_window_s > 0:
                tail = (
                    f" (retry window {retry_window_s:.0f}s is too small for "
                    f"a {RETRY_SLEEP_S:.0f}s retry cycle — no retry was "
                    "attempted)"
                )
            else:
                tail = ""
            raise TPUUnhealthyError(prefix + rep.reason + tail)
        print(
            f"{prefix}health probe attempt {attempt} failed "
            f"({rep.reason.splitlines()[0][:120]}); retrying for another "
            f"{remaining:.0f}s",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(RETRY_SLEEP_S)
