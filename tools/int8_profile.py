"""Per-op / per-stage int8-vs-bf16 profile on the real chip.

Closes the "int8 delivers no speedup" question with data instead of
inference (RESULTS.md int8 note). Three measurements, all with the honest
marginal-readback methodology (see bench.py / CLAUDE.md):

1. Whole-model forward (shipped lite0 checkpoint, calibrated scales),
   bf16 vs int8, at batch 64/128/256 — the serving configurations.
2. Stage split (backbone vs BiFPN+heads) in both modes — localizes where
   the int8 path spends its time.
3. Conv micro-ablation on representative lite0 layer shapes: bf16 conv vs
   the full QuantConv int8 path (quantize input -> s8xs8->s32 -> dequant)
   vs the bare int8 MXU core (pre-quantized int8 operands, int32 output,
   no q/dq chains). core/bf16 is the physical MXU headroom; qdq/bf16 is
   what a network actually sees after the elementwise quantize/dequantize
   traffic.

The reference ships int8 because its CPU XNNPACK backend requires it
(train.py:67 export + evaluate_tflite); on TPU int8 is a choice that has
to pay for its q/dq bandwidth. Usage: python -m tools.int8_profile
(idle chip required — do not run while training holds the TPU).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from vbt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from vbt_tpu.ops.preprocess import preprocess_frames
from vbt_tpu.runtime.pipeline import DetectionPipeline

N_SHORT, N_LONG, TRIALS = 8, 40, 3


def marginal_ms(fn, *args, n_short=N_SHORT, n_long=N_LONG, trials=TRIALS,
                adaptive=False):
    """Median positive marginal ms/iter between short and long runs.

    Non-positive trials are tunnel hiccups (the short run absorbed a stall
    bigger than the long run's extra work) and are discarded, exactly like
    bench.py — keeping them produced negative 'times' in the first
    round-4 capture. Sub-ms programs need n_long >> the ~27 ms tunnel sync
    jitter. ``adaptive=True`` sizes the window from a pilot run instead of
    fixed counts: the second round-4 capture timed out because a fixed
    1,100-iteration schedule met a multi-hundred-ms/iter conv (the int8
    3-channel stem) — aim the marginal window at ~3 s of work instead."""
    def run(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        return time.perf_counter() - t0

    run(2)
    if adaptive:
        pilot = run(3) / 3  # seconds/iter, includes one ~27 ms sync
        span = max(8, min(400, int(3.0 / max(pilot, 1e-4))))
        n_short, n_long = max(2, span // 10), span
    rates = []
    for _ in range(trials):
        ts = run(n_short)
        tl = run(n_long)
        rates.append((tl - ts) / (n_long - n_short))
    rates = [r for r in rates if r > 0]
    if not rates:
        raise RuntimeError("no positive marginal trial (tunnel hiccups)")
    return float(np.median(rates)) * 1e3


N_WEIGHT_BUFS = 8  # distinct weight buffers cycled inside the chain


def _chain_ms(conv_of, x, w_stack, n_short=8, n_long=72, trials=5):
    """ms per conv via IN-GRAPH chained repetition.

    Host-loop dispatch timing of sub-ms convs over the axon tunnel produced
    garbage in both round-4 captures (negative marginals, 87 ms vs 598 ms
    for the same shape run-to-run): each iteration pays a dispatch whose
    jitter is ~27 ms, orders of magnitude above the kernel. Instead run the
    conv ``n`` times inside ONE XLA program (`lax.fori_loop`, each step
    consuming a different weight buffer so XLA cannot hoist/CSE, a scalar
    reduction as the carried dependency), so one dispatch + one scalar
    readback covers the whole chain — the same technique as bench.py's
    chained-matmul TFLOPS calibration. The short/long marginal cancels the
    per-dispatch overhead that remains.
    """
    def prog(n):
        @jax.jit
        def run(x, ws):
            def body(i, acc):
                y = conv_of(x, ws[i % N_WEIGHT_BUFS])
                return acc + y.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    short, long_ = prog(n_short), prog(n_long)
    float(short(x, w_stack))  # compile both outside the timed region
    float(long_(x, w_stack))
    rates = []
    for _ in range(trials):
        t0 = time.perf_counter()
        s = float(short(x, w_stack))
        t1 = time.perf_counter()
        l = float(long_(x, w_stack))
        t2 = time.perf_counter()
        del s, l
        rates.append(((t2 - t1) - (t1 - t0)) / (n_long - n_short))
    rates = [r for r in rates if r > 0]
    if not rates:
        raise RuntimeError("no positive marginal trial (tunnel hiccups)")
    return float(np.median(rates)) * 1e3


def conv_micro(batch, h, w, cin, cout, k, stride):
    """bf16 vs int8-with-q/dq vs int8-core for one conv shape.

    The 3-channel stem is deliberately NOT measured standalone: a bare
    C=3 NHWC conv compiles to a pathological padded layout in isolation
    (measured 87-598 ms for a 2.8 GMAC conv whose cost inside the fused
    model forward is bounded by the whole model's ~7 ms), so a standalone
    number says nothing about the model. Only deep shapes whose isolated
    layout matches their in-model layout are profiled.
    """
    rng = np.random.default_rng(0)
    x_f = jnp.asarray(rng.normal(size=(batch, h, w, cin)), jnp.bfloat16)
    ws_f = jnp.asarray(
        rng.normal(size=(N_WEIGHT_BUFS, k, k, cin, cout)), jnp.bfloat16)
    x_i = jnp.asarray(rng.integers(-127, 128, size=(batch, h, w, cin)), jnp.int8)
    ws_i = jnp.asarray(
        rng.integers(-127, 128, size=(N_WEIGHT_BUFS, k, k, cin, cout)), jnp.int8)
    dn = jax.lax.conv_dimension_numbers(
        x_f.shape, (k, k, cin, cout), ("NHWC", "HWIO", "NHWC"))

    def bf16(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME", dimension_numbers=dn)

    def int8_qdq(x, w):
        # The QuantConv int8 path: per-tensor activation quantize, conv in
        # int8 with s32 accumulation, dequantize with the product scale.
        sx = jnp.float32(0.05)
        sw = jnp.float32(0.02)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                      ).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, w, (stride, stride), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (sx * sw)).astype(jnp.bfloat16)

    def int8_core(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    macs = (h // stride) * (w // stride) * cout * cin * k * k * batch
    return {
        "shape": f"{batch}x{h}x{w}x{cin}->{cout} k{k}s{stride}",
        "gmacs": macs / 1e9,
        "bf16_ms": _chain_ms(bf16, x_f, ws_f),
        "int8_qdq_ms": _chain_ms(int8_qdq, x_i.astype(jnp.bfloat16), ws_i),
        "int8_core_ms": _chain_ms(int8_core, x_i, ws_i),
    }


def main():
    import sys

    micro_only = "--micro_only" in sys.argv
    rng = np.random.default_rng(0)
    bf16_pipe = DetectionPipeline.from_model_arg(
        "models/efficientdet_lite0_whole.msgpack", dtype=jnp.bfloat16)
    size = bf16_pipe.spec.input_size
    calib = rng.integers(0, 255, size=(16, size, size, 3)).astype(np.uint8)
    int8_pipe = bf16_pipe.calibrate(calib)

    report = {"whole_model": [], "stages": [], "conv_micro": []}

    if not micro_only:
        for batch in (64, 128, 256):
            frames = jnp.asarray(
                rng.integers(0, 255, size=(batch, size, size, 3)), jnp.uint8)
            row = {"batch": batch}
            for tag, pipe in (("bf16", bf16_pipe), ("int8", int8_pipe)):
                row[f"{tag}_ms"] = marginal_ms(
                    pipe._forward, pipe.variables, frames, trials=5)
            row["speedup"] = row["bf16_ms"] / row["int8_ms"]
            report["whole_model"].append(row)
            print(json.dumps(row), flush=True)

        # Stage split at batch 128 (the serving sweet spot). NOTE: the
        # split programs materialize the feature pyramid to HBM as program
        # outputs/inputs, which the fused forward never does — stage times
        # overstate the fused cost and are for RELATIVE localization only.
        batch = 128
        frames = jnp.asarray(
            rng.integers(0, 255, size=(batch, size, size, 3)), jnp.uint8)
        images = jax.jit(
            lambda f: preprocess_frames(f, size, dtype=jnp.bfloat16))(frames)
        for tag, pipe in (("bf16", bf16_pipe), ("int8", int8_pipe)):
            model, variables, quant = pipe._model, pipe.variables, pipe.quant

            bb = jax.jit(lambda x, v=variables, q=quant: model.apply(
                v, x, False, q,
                method=lambda m, x, train, qq: m.backbone(x, train, qq)))
            feats = bb(images)
            nh = jax.jit(lambda f, v=variables, q=quant: model.apply(
                v, f, False, q, method="neck_and_heads"))
            row = {
                "stage_profile": tag,
                "backbone_ms": marginal_ms(bb, images, trials=5),
                "neck_heads_ms": marginal_ms(nh, feats, trials=5),
            }
            report["stages"].append(row)
            print(json.dumps(row), flush=True)

    # Representative lite0 deep conv shapes (see conv_micro docstring for
    # why the 3-channel stem is excluded).
    for shape in [
        (128, 40, 40, 24, 144, 1, 1),     # early pointwise expand at P3 res
        (128, 20, 20, 112, 672, 1, 1),    # late pointwise expand
        (128, 10, 10, 1152, 320, 1, 1),   # final stage pointwise
        (128, 40, 40, 64, 64, 3, 1),      # BiFPN/head 3x3 at P3
    ]:
        row = conv_micro(*shape)
        report["conv_micro"].append(row)
        print(json.dumps(row), flush=True)

    with open("/tmp/int8_profile.json", "w") as f:
        json.dump(report, f, indent=1)
    print("wrote /tmp/int8_profile.json")


if __name__ == "__main__":
    main()
