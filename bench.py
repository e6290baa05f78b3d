"""Benchmark: EfficientDet-Lite0 @320 batched detection throughput per chip.

Measures the full device pipeline — fused uint8 preprocessing, bf16
backbone+BiFPN+heads, Pallas anchor-decode + NMS — and prints ONE JSON line.
Baseline: the north-star target of 2000 frames/sec per chip (BASELINE.md;
the reference publishes no throughput numbers).

Methodology (revised in round 2): on the axon dev tunnel,
``jax.block_until_ready`` can return before the remote device has finished,
so naive wall-clock loops overstate throughput by >10x (round 1 reported
103k fps this way; physically impossible at 197 bf16 TFLOPS peak). Every
measurement here therefore forces a HOST READBACK of a value that depends on
the timed work, and the per-batch rate is the MARGINAL rate between a short
and a long run of the same loop — which cancels the fixed ~27 ms
dispatch+sync overhead of the tunnel that a production (local) host would
not pay. Device execution is FIFO, so reading back the final program's
output bounds completion of the whole queue.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import os

# Batch 128 sustains ~25% higher throughput than 64 on v5e (the model is
# dispatch/VPU-bound at 64; tools/perf_probe.py); the north-star metric is
# frames/sec/chip for batched video, so the bench runs at the better
# operating point and records the batch in the JSON. Override: BENCH_BATCH.
BATCH = int(os.environ.get("BENCH_BATCH", "128"))
N_SHORT = 8
N_LONG = 40
TRIALS = 3
TARGET_FPS = 2000.0  # north-star baseline (BASELINE.md)
V5E_PEAK_BF16 = 197e12


def _timed_detect(pipeline, batches, iters) -> float:
    """Wall time for `iters` full detect_batch programs, completion forced
    by reading back a scalar that depends on the final program."""
    t0 = time.perf_counter()
    total = 0
    for i in range(iters):
        out = pipeline.detect_batch(batches[i % len(batches)])
    total = int(np.asarray(out.count).sum())  # forces the full FIFO queue
    dt = time.perf_counter() - t0
    assert total >= 0
    return dt


def _timed_forward(pipeline, batches, iters) -> float:
    t0 = time.perf_counter()
    for i in range(iters):
        deltas, logits = pipeline._forward(
            pipeline.variables, batches[i % len(batches)]
        )
    np.asarray(jnp.sum(logits[..., 0]))  # readback forces completion
    return time.perf_counter() - t0


def _marginal_seconds_per_iter(
    timed_fn, pipeline, batches
) -> tuple[float, float, list[float]]:
    """(best, median, all_trials) marginal seconds/iteration between short
    and long runs.

    A tunnel hiccup inside the SHORT run can make a trial's marginal rate
    collapse toward zero (or negative) — exactly the overstatement failure
    this methodology exists to prevent — so non-positive trials are
    discarded and the MEDIAN is the headline; best is auxiliary. All raw
    trials (including discarded ones) go into the raw-capture record."""
    raw = []
    for _ in range(TRIALS):
        t_short = timed_fn(pipeline, batches, N_SHORT)
        t_long = timed_fn(pipeline, batches, N_LONG)
        raw.append((t_long - t_short) / (N_LONG - N_SHORT))
    rates = [r for r in raw if r > 0]
    if not rates:
        # Every trial was non-positive: the tunnel swallowed the timing.
        # Publishing 0.0 (or inf fps) would be a bogus headline — fail loud
        # (main() converts this into the explicit invalid-JSON verdict).
        exc = RuntimeError(
            "benchmark invalid: no positive marginal-rate trial survived "
            "(tunnel hiccups in every trial); rerun on an idle chip"
        )
        exc.raw_trials = raw
        raise exc
    return min(rates), float(np.median(rates)), raw


def main(int8: bool = False, turbo: bool = False, prefilter: str = "exact"):
    import sys

    from vbt_tpu.utils.cache import enable_persistent_cache
    from vbt_tpu.utils.health import TPUUnhealthyError, require_healthy_tpu

    # Fail FAST on a wedged/degraded tunnel — but RETRY for a window first:
    # the driver runs bench exactly once per round, and rounds 3 and 4 both
    # lost their only capture to transient degradation windows. The probe
    # re-checks every ~2 min for VBT_TPU_HEALTH_RETRY_S seconds before
    # emitting the explicit invalid-JSON verdict. Only bench defaults to a
    # nonzero window; interactive CLIs stay fail-fast unless the user
    # exports VBT_TPU_HEALTH_RETRY_S (the env var is a global knob,
    # health.py:require_healthy_tpu). The default window is 600 s, NOT longer: the
    # driver kills a bench attempt at ~900 s (BENCH_r03 rc=124 came from two
    # such silent kills), and an rc=124 with no JSON line is strictly worse
    # than an explicit invalid verdict — the window must leave room for the
    # measurement itself inside that budget.
    try:
        require_healthy_tpu(
            context="bench",
            retry_window_s=float(os.environ.get("VBT_TPU_HEALTH_RETRY_S", "600")),
        )
    except TPUUnhealthyError as e:
        print(
            json.dumps(
                {
                    "metric": "efficientdet_lite0_320_detection_throughput",
                    "value": None,
                    "unit": "frames/sec/chip",
                    "vs_baseline": None,
                    "invalid": True,
                    "reason": str(e),
                }
            )
        )
        sys.exit(1)

    enable_persistent_cache()
    from vbt_tpu.models import get_model_spec
    from vbt_tpu.runtime.pipeline import DetectionPipeline, serving_config

    on_tpu, dtype = serving_config()

    spec = get_model_spec("efficientdet_lite0")
    # Bench the shipped artifact when present (real score distributions
    # exercise the NMS early-exit behavior); random init is the fallback
    # so the bench still runs in a fresh checkout.
    ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "models", "efficientdet_lite0_whole.msgpack",
    )
    backbone = "turbo" if turbo else "xla"
    if os.path.isfile(ckpt):
        pipeline = DetectionPipeline.from_model_arg(
            ckpt, use_pallas=on_tpu, dtype=dtype, backbone=backbone,
            prefilter=prefilter,
        )
    else:
        pipeline = DetectionPipeline(
            spec=spec,
            variables=DetectionPipeline.init_variables(spec, dtype=dtype),
            use_pallas=on_tpu,
            dtype=dtype,
            backbone=backbone,
            prefilter=prefilter,
        )

    rng = np.random.default_rng(0)
    if int8:
        calib = rng.integers(
            0, 255, size=(8, spec.input_size, spec.input_size, 3)
        ).astype(np.uint8)
        pipeline = pipeline.calibrate(calib)
    # Distinct frame batches so backend result-caching cannot flatter us.
    batches = [
        jnp.asarray(
            rng.integers(0, 255, size=(BATCH, spec.input_size, spec.input_size, 3)),
            jnp.uint8,
        )
        for _ in range(8)
    ]

    metric = "efficientdet_lite0_320_detection_throughput"
    if int8:
        metric += "_int8"
    if turbo:
        metric += "_turbo"
    if prefilter != "exact":
        metric += f"_{prefilter}"

    # Any failure past the health probe (compile/execute error mid-warmup, or
    # every marginal trial swallowed by a tunnel hiccup) must still end in an
    # explicit machine-readable verdict: the driver parses exactly one JSON
    # line, and a traceback with no JSON loses the round's only capture.
    try:
        # Warmup (compile both programs + populate tunnel caches).
        _timed_detect(pipeline, batches, 2)
        _timed_forward(pipeline, batches, 2)

        best_spi, median_spi, detect_trials = _marginal_seconds_per_iter(
            _timed_detect, pipeline, batches
        )
        fwd_best_spi, fwd_median_spi, fwd_trials = _marginal_seconds_per_iter(
            _timed_forward, pipeline, batches
        )
    except Exception as e:  # noqa: BLE001 — verdict first, traceback second
        import traceback

        traceback.print_exc()
        verdict = {
            "metric": metric,
            "value": None,
            "unit": "frames/sec/chip",
            "vs_baseline": None,
            "invalid": True,
            "reason": f"{type(e).__name__}: {e}",
        }
        raw_trials = getattr(e, "raw_trials", None)
        if raw_trials is not None:
            verdict["raw_trials_s_per_iter"] = [round(r, 6) for r in raw_trials]
        print(json.dumps(verdict))
        sys.exit(1)

    best_fps = BATCH / best_spi
    median_fps = BATCH / median_spi
    fps = median_fps  # headline: median (defensible under tunnel hiccups)
    fwd_ms = fwd_median_spi * 1e3

    # MFU from XLA's own cost analysis of the already-compiled forward.
    try:
        ca = (
            pipeline._forward
            .lower(pipeline.variables, batches[0])
            .compile()
            .cost_analysis()
        )
        ca = ca[0] if isinstance(ca, list) else ca
        flops_per_batch = float(ca.get("flops", 2 * 0.876e9 * BATCH))
    except Exception:
        flops_per_batch = 2 * 0.876e9 * BATCH  # lite0 GMACs (reference logs)
    mfu = flops_per_batch / fwd_median_spi / V5E_PEAK_BF16 if on_tpu else None

    headline = {
        "metric": metric,
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / TARGET_FPS, 3),
        "batch": BATCH,
        "best_fps": round(best_fps, 1),
        "forward_ms_per_batch": round(fwd_ms, 3),
        "mfu": round(mfu, 4) if mfu is not None else None,
    }
    print(json.dumps(headline))

    # Raw-capture record: every valid run leaves a committable artifact with
    # the per-trial marginal rates (VERDICT r4: the 10k headline rested on
    # /tmp captures that were never committed). VBT_TPU_BENCH_RAW overrides
    # the path; "0" disables.
    raw_path = os.environ.get(
        "VBT_TPU_BENCH_RAW",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tools", "data_bench_last.json",
        ),
    )
    if raw_path != "0":
        record = {
            "headline": headline,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
            "n_short": N_SHORT,
            "n_long": N_LONG,
            "detect_trials_s_per_iter": [round(r, 6) for r in detect_trials],
            "forward_trials_s_per_iter": [round(r, 6) for r in fwd_trials],
            "detect_trials_fps": [
                round(BATCH / r, 1) if r > 0 else None for r in detect_trials
            ],
            "checkpoint": os.path.basename(ckpt) if os.path.isfile(ckpt) else "random-init",
        }
        try:
            with open(raw_path, "w") as f:
                json.dump(record, f, indent=1)
                f.write("\n")
        except OSError:
            pass  # read-only checkout must not kill the capture


def _metric_name(argv) -> str:
    metric = "efficientdet_lite0_320_detection_throughput"
    if "--int8" in argv:
        metric += "_int8"
    if "--turbo" in argv:
        metric += "_turbo"
    if "--approx_prefilter" in argv:
        metric += "_approx"
    return metric


def _outer(argv) -> int:
    """Probe, then run the measurement in a DEADLINED SUBPROCESS.

    Round-5 live finding: a degradation window can wedge the fused detect
    program while the health probe's forward-only program still passes —
    the parent then blocks forever inside a device readback (no Python
    signal can interrupt it) and the driver's silent ~900 s kill leaves
    rc=124 with no JSON, losing the round's only capture. Running the
    measurement in a child with a wall deadline turns that into an
    explicit invalid verdict. Budget: VBT_TPU_BENCH_DEADLINE_S (default
    850 s ≈ driver kill minus margin) minus whatever the probe consumed.
    """
    import subprocess
    import sys

    from vbt_tpu.utils.health import TPUUnhealthyError, require_healthy_tpu

    def invalid(reason: str) -> int:
        print(
            json.dumps(
                {
                    "metric": _metric_name(argv),
                    "value": None,
                    "unit": "frames/sec/chip",
                    "vs_baseline": None,
                    "invalid": True,
                    "reason": reason,
                }
            )
        )
        return 1

    t_start = time.monotonic()
    try:
        require_healthy_tpu(
            context="bench",
            retry_window_s=float(os.environ.get("VBT_TPU_HEALTH_RETRY_S", "600")),
        )
    except TPUUnhealthyError as e:
        return invalid(str(e))
    budget = max(
        30.0,
        float(os.environ.get("VBT_TPU_BENCH_DEADLINE_S", "850"))
        - (time.monotonic() - t_start),
    )
    env = dict(os.environ)
    env["VBT_TPU_BENCH_INNER"] = "1"
    env["VBT_TPU_HEALTH_PROBE"] = "0"  # already probed above
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *argv],
            env=env, timeout=budget, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return invalid(
            f"measurement wedged: health probe passed but the measurement "
            f"subprocess exceeded its {budget:.0f}s budget — a degradation "
            "window hit the detect program mid-measurement (seen live "
            "round 5: forward probe 12 ms while detect wedged >400 s)"
        )
    sys.stderr.write(proc.stderr or "")
    out = (proc.stdout or "").strip()
    if out:
        print(out)  # the child's one JSON line (headline or invalid)
        return proc.returncode
    return invalid(f"bench subprocess died (rc={proc.returncode}) with no JSON line")


if __name__ == "__main__":
    import sys

    argv = sys.argv[1:]
    if (
        os.environ.get("VBT_TPU_BENCH_INNER") == "1"
        or os.environ.get("VBT_TPU_HEALTH_PROBE") == "0"
    ):
        # Direct (inner) run: measure in THIS process. VBT_TPU_HEALTH_PROBE=0
        # also lands here so a user explicitly skipping the probe keeps the
        # old single-process behavior.
        main(
            int8="--int8" in argv,
            turbo="--turbo" in argv,
            prefilter="approx" if "--approx_prefilter" in argv else "exact",
        )
    else:
        sys.exit(_outer(argv))
