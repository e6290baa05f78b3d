"""Honest TPU timing probes for the detection pipeline.

Methodology per bench.py: every timed region ends in a host readback of a
value depending on the work; rates are marginal between short and long
loops (cancels the dev tunnel's fixed sync overhead). Run on an idle chip.

Usage: python tools/perf_probe.py [--int8]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vbt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from vbt_tpu.models import get_model_spec
from vbt_tpu.runtime.pipeline import DetectionPipeline

N_SHORT, N_LONG, TRIALS = 8, 40, 3


def marginal_ms(fn, *args):
    """Marginal milliseconds per call of fn(*args) (forces readback)."""

    def run(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        return time.perf_counter() - t0

    run(2)  # warmup/compile
    rates = []
    for _ in range(TRIALS):
        ts = run(N_SHORT)
        tl = run(N_LONG)
        rates.append((tl - ts) / (N_LONG - N_SHORT))
    # Non-positive marginals are tunnel hiccups (a stall landed inside the
    # short run); discard them rather than let them poison the median.
    rates = [r for r in rates if r > 0]
    if not rates:
        raise RuntimeError("no positive marginal trial (tunnel hiccups)")
    return float(np.median(rates)) * 1e3


def main():
    int8 = "--int8" in sys.argv
    spec = get_model_spec("efficientdet_lite0")
    rng = np.random.default_rng(0)
    pipe = DetectionPipeline(
        spec=spec,
        variables=DetectionPipeline.init_variables(spec, dtype=jnp.bfloat16),
        use_pallas=True,
        dtype=jnp.bfloat16,
    )
    if int8:
        calib = rng.integers(0, 255, size=(8, 320, 320, 3)).astype(np.uint8)
        pipe = pipe.calibrate(calib)

    for batch in (64, 128, 256):
        frames = jnp.asarray(
            rng.integers(0, 255, size=(batch, 320, 320, 3)), jnp.uint8
        )
        fwd = jax.jit(pipe._forward_impl)
        ms = marginal_ms(fwd, pipe.variables, frames)
        print(
            f"batch {batch:4d}: forward {ms:7.3f} ms "
            f"({batch / ms * 1e3:8.0f} fps, "
            f"{115.25e9 / 64 * batch / (ms / 1e3) / 1e12:6.1f} TFLOP/s)"
        , flush=True)

    # Split vs fused detect (forward + postprocess).
    frames = jnp.asarray(rng.integers(0, 255, size=(64, 320, 320, 3)), jnp.uint8)

    def split(variables, frames):
        deltas, logits = pipe._forward(variables, frames)
        return pipe._post(deltas, logits, score_threshold=0.0)

    ms_split = marginal_ms(split, pipe.variables, frames)
    print(f"detect split: {ms_split:7.3f} ms ({64 / ms_split * 1e3:8.0f} fps)", flush=True)

    anchors = jnp.asarray(pipe.anchors)

    from vbt_tpu.ops.nms_pallas import detection_postprocess_pallas
    from vbt_tpu.ops.postprocess import detection_postprocess

    @jax.jit
    def fused(variables, frames):
        deltas, logits = pipe._forward_impl(variables, frames)
        return detection_postprocess_pallas(
            deltas, logits, anchors, input_size=spec.input_size,
            max_detections=25, score_threshold=0.0,
        )

    ms_fused = marginal_ms(fused, pipe.variables, frames)
    print(f"detect fused: {ms_fused:7.3f} ms ({64 / ms_fused * 1e3:8.0f} fps)", flush=True)

    # Postprocess alone: Pallas vs XLA.
    deltas, logits = jax.block_until_ready(pipe._forward(pipe.variables, frames))

    pall = jax.jit(
        lambda d, l: detection_postprocess_pallas(
            d, l, anchors, input_size=spec.input_size, max_detections=25,
            score_threshold=0.0,
        )
    )
    xla = jax.jit(
        lambda d, l: detection_postprocess(
            d, l, anchors, input_size=spec.input_size, max_detections=25,
            score_threshold=0.0,
        )
    )
    print(f"post pallas:  {marginal_ms(pall, deltas, logits):7.3f} ms", flush=True)
    print(f"post xla:     {marginal_ms(xla, deltas, logits):7.3f} ms", flush=True)

    # Batch-128 postprocess decomposition: where the non-forward time goes
    # (VERDICT round-2: >50% of detect wall time was outside the forward).
    from vbt_tpu.models.anchors import decode_boxes
    from vbt_tpu.ops import nms_pallas

    frames = jnp.asarray(rng.integers(0, 255, size=(128, 320, 320, 3)), jnp.uint8)
    deltas, logits = jax.block_until_ready(pipe._forward(pipe.variables, frames))
    k = nms_pallas.NUM_CANDIDATES

    @jax.jit
    def prefilter_only(d, l):
        flat = l[..., 0].astype(jnp.float32)
        top_logits, top_idx = jax.lax.top_k(flat, k)
        top_deltas = jnp.take_along_axis(d.astype(jnp.float32),
                                         top_idx[..., None], axis=1)
        top_anchors = jnp.asarray(anchors, jnp.float32)[top_idx]
        return top_logits, decode_boxes(top_deltas, top_anchors) / spec.input_size

    @jax.jit
    def topk_only(l):
        return jax.lax.top_k(l[..., 0].astype(jnp.float32), k)

    print(f"[b128] post pallas:      {marginal_ms(pall, deltas, logits):7.3f} ms", flush=True)
    print(f"[b128] prefilter+decode: {marginal_ms(prefilter_only, deltas, logits):7.3f} ms", flush=True)
    print(f"[b128] top_k alone:      {marginal_ms(topk_only, logits):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
