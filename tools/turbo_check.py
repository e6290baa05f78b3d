"""Prove-or-retire the turbo (fused-MBConv Pallas) backbone on real TPU.

Round 3 shipped ops/fused_mbconv.py + models/turbo.py with its numerics
pinned only in Pallas *interpret* mode on CPU and no recorded throughput.
This tool produces both missing pieces on the live chip:

1. **Numerics**: run the shipped lite0 checkpoint over the full 61-image
   reference test set (bf16, real Mosaic lowering) with the XLA backbone
   and the turbo backbone, and compare the decoded detections —
   per-image count equality, max |score delta|, max |box delta| — at the
   same tolerance the CPU interpret-mode test uses (1e-4), plus a bf16
   budget line (bf16 reorders accumulation, so report the actual deltas).
2. **Speed**: marginal-readback fps (bench.py methodology) for the full
   fused detect program, xla-vs-turbo, at batch 64 and 128.

Prints a compact report; exit code 1 if numerics diverge beyond the bf16
budget (count mismatch or box delta > 1e-2 normalized).

Usage (idle chip, healthy window):  python -m tools.turbo_check
"""

import glob
import json
import os
import sys
import time

import numpy as np

BUDGET_BOX = 1e-2  # normalized coords; bf16 eps is 2^-8 ~ 4e-3
BUDGET_SCORE = 2e-2


def _marginal_ms(fn, batches, n_short=4, n_long=12, trials=3):
    import jax

    rates = []
    for _ in range(trials):
        ts = _run(fn, batches, n_short)
        tl = _run(fn, batches, n_long)
        rates.append((tl - ts) / (n_long - n_short))
    rates = [r for r in rates if r > 0]
    if not rates:
        raise RuntimeError("no positive marginal trial (tunnel hiccups)")
    return float(np.median(rates)) * 1e3


def _run(fn, batches, n):
    t0 = time.perf_counter()
    out = None
    for i in range(n):
        out = fn(batches[i % len(batches)])
    import jax

    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # forced readback
    return time.perf_counter() - t0


def main():
    from vbt_tpu.utils.health import require_healthy_tpu

    require_healthy_tpu(context="turbo_check")

    import cv2
    import jax
    import jax.numpy as jnp

    from vbt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from vbt_tpu.runtime.pipeline import DetectionPipeline, serving_config

    on_tpu, dtype = serving_config()
    ckpt = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "models", "efficientdet_lite0_whole.msgpack",
    )
    pipes = {
        name: DetectionPipeline.from_model_arg(
            ckpt, use_pallas=on_tpu, dtype=dtype, backbone=name
        )
        for name in ("xla", "turbo")
    }
    size = pipes["xla"].spec.input_size

    # ---- numerics on the real test set --------------------------------
    files = sorted(glob.glob("/root/reference/data/test/*.jpg"))
    imgs = []
    for f in files:
        img = cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB)
        imgs.append(cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR))
    frames = jnp.asarray(np.stack(imgs), jnp.uint8)
    det = {k: p.detect_batch(frames) for k, p in pipes.items()}
    counts = {k: np.asarray(v.count) for k, v in det.items()}
    count_match = int((counts["xla"] == counts["turbo"]).sum())
    # compare only valid rows per image (padding rows are zeros anyway)
    smax = bmax = 0.0
    for i in range(len(files)):
        n = int(min(counts["xla"][i], counts["turbo"][i]))
        s = np.abs(
            np.asarray(det["xla"].scores[i][:n], np.float32)
            - np.asarray(det["turbo"].scores[i][:n], np.float32)
        )
        b = np.abs(
            np.asarray(det["xla"].boxes[i][:n], np.float32)
            - np.asarray(det["turbo"].boxes[i][:n], np.float32)
        )
        if n:
            smax = max(smax, float(s.max()))
            bmax = max(bmax, float(b.max()))
    print(
        f"numerics: {count_match}/{len(files)} images count-equal, "
        f"max|score delta| {smax:.2e}, max|box delta| {bmax:.2e} "
        f"(budget {BUDGET_SCORE:.0e}/{BUDGET_BOX:.0e})"
    )
    numerics_ok = count_match == len(files) and smax <= BUDGET_SCORE and bmax <= BUDGET_BOX

    # ---- speed ----------------------------------------------------------
    rng = np.random.default_rng(0)
    report = {"numerics_ok": numerics_ok, "count_match": count_match,
              "score_delta": smax, "box_delta": bmax}
    for batch in (64, 128):
        batches = [
            jnp.asarray(rng.integers(0, 255, size=(batch, size, size, 3)), jnp.uint8)
            for _ in range(4)
        ]
        for name, p in pipes.items():
            fn = lambda b, _p=p: _p.detect_batch(b)
            _run(fn, batches, 2)  # warmup/compile
            ms = _marginal_ms(fn, batches)
            fps = batch / ms * 1e3
            report[f"{name}_b{batch}_ms"] = round(ms, 3)
            report[f"{name}_b{batch}_fps"] = round(fps, 1)
            print(f"detect {name:5s} b{batch}: {ms:7.3f} ms/batch  {fps:8.1f} fps")
    print("JSON:", json.dumps(report))
    sys.exit(0 if numerics_ok else 1)


if __name__ == "__main__":
    main()
