"""Per-stage roofline accounting for the serving pipeline (lite0 @320 b128).

RESULTS.md closes the perf frontier with "the forward is bandwidth-bound at
the HBM roofline" — this tool makes that claim auditable (VERDICT r4,
weak #5): it produces a committed per-stage decomposition of TIME (measured,
marginal-readback methodology — see bench.py/CLAUDE.md) and HBM BYTES
(analytic walk over the exact architecture), so the GB/s each stage implies
can be compared against the v5e's sustained HBM rate.

Time: five nested prefix programs, each jitted from the same uint8 frames —
    P0 preprocess | P1 +backbone | P2 +BiFPN | P3 +heads (= full forward)
    | P4 +postprocess (= full detect)
Stage time = marginal ms difference of consecutive prefixes. Caveat: each
prefix materializes its outputs to HBM as program results, which the fused
program does not, so stage boundaries carry a small materialization skew —
the FUSED detect total (also measured) is the ground truth the stages must
approximately sum to.

Bytes: an analytic walk assuming perfect elementwise fusion — every conv
reads its input activation once (bf16), reads its f32 weights, writes its
output once; BN/ReLU6 are epilogue-fused (free); residual/fusion adds read
their extra operands; resamples read+write. This is the IDEAL (lower-bound,
unpadded) traffic: real XLA layouts pad channels into (8,128) tiles, so
shallow-channel tensors (the 3-channel input, 32-channel stem) move more
than the ideal. XLA's own cost-analysis bytes are recorded as the upper
cross-check (CLAUDE.md: it overcounts gathers, fine for convs).

Usage (idle chip): python -m tools.roofline
Writes tools/data_roofline_r5.json and prints the table.
"""

import json
import math
import os
import sys

import numpy as np

# v5e HBM: 16 GB @ 819 GB/s peak. Sustained on real kernels is ~70-85% of
# peak; 0.75 is the conventional planning number.
HBM_PEAK_GBS = 819.0
HBM_SUSTAINED_GBS = 0.75 * HBM_PEAK_GBS

BATCH = 128
ACT = 2  # bf16 activation bytes
W = 4    # f32 parameter bytes


def _conv_bytes(hw_in, cin, cout, k, stride, batch, groups=1):
    """(bytes, hw_out) for one conv: read in + read weights + write out."""
    hw_out = math.ceil(hw_in / stride)
    reads = hw_in * hw_in * cin * ACT * batch
    reads += k * k * (cin // groups) * cout * W
    writes = hw_out * hw_out * cout * ACT * batch
    return reads + writes, hw_out


def analytic_bytes(batch=BATCH, size=320):
    """Per-stage ideal HBM bytes for efficientdet_lite0 @ `size`."""
    from vbt_tpu.models.anchors import ANCHORS_PER_CELL
    from vbt_tpu.models.efficientnet_lite import STEM_CHANNELS, scaled_blocks

    stages = {}

    # preprocess: read uint8 frames, write bf16 normalized images (the bench
    # feeds frames already at the input size, so resize is a cast+affine).
    stages["preprocess"] = (
        size * size * 3 * 1 * batch + size * size * 3 * ACT * batch
    )

    # backbone
    total = 0
    b, hw = batch, size
    per_group = {}
    bb, hw = _conv_bytes(hw, 3, STEM_CHANNELS, 3, 2, b)
    per_group["stem"] = bb
    total += bb
    cin = STEM_CHANNELS
    for gi, g in enumerate(scaled_blocks("lite0")):
        gbytes = 0
        for ri in range(g.repeats):
            stride = g.stride if ri == 0 else 1
            mid = cin * g.expand
            hw_in = hw
            if g.expand != 1:
                x, _ = _conv_bytes(hw_in, cin, mid, 1, 1, b)
                gbytes += x
            x, hw_mid = _conv_bytes(hw_in, mid, mid, g.kernel, stride, b,
                                    groups=mid)
            gbytes += x
            x, hw_out = _conv_bytes(hw_mid, mid, g.out_ch, 1, 1, b)
            gbytes += x
            if stride == 1 and cin == g.out_ch:
                gbytes += hw_out * hw_out * g.out_ch * ACT * b  # shortcut read
            cin, hw = g.out_ch, hw_out
        per_group[f"g{gi}"] = gbytes
        total += gbytes
    stages["backbone"] = total
    stages["_backbone_groups"] = per_group

    # BiFPN (lite0: channels=64, repeats=3, levels P3..P7)
    ch, repeats = 64, 3
    lv_hw = {3: size // 8, 4: size // 16, 5: size // 32}
    lv_hw[6] = math.ceil(lv_hw[5] / 2)
    lv_hw[7] = math.ceil(lv_hw[6] / 2)
    c_taps = {3: 40, 4: 112, 5: 320}  # lite0 C3/C4/C5 channels
    fpn = 0
    for lv in (3, 4, 5):  # lateral 1x1 resamples
        x, _ = _conv_bytes(lv_hw[lv], c_taps[lv], ch, 1, 1, b)
        fpn += x
    x, _ = _conv_bytes(lv_hw[5], c_taps[5], ch, 1, 1, b)  # lateral_p6
    fpn += x
    # p6/p7 max-pool downsamples: read in + write out
    fpn += (lv_hw[5] ** 2 + lv_hw[6] ** 2) * ch * ACT * b
    fpn += (lv_hw[6] ** 2 + lv_hw[7] ** 2) * ch * ACT * b

    def fuse_node(hw_node, n_inputs):
        # sum(n inputs) + ReLU6 fuses into the depthwise read; count each
        # extra operand as one read. SepConv = depthwise 3x3 + pointwise 1x1.
        extra_reads = (n_inputs - 1) * hw_node * hw_node * ch * ACT * b
        dw, _ = _conv_bytes(hw_node, ch, ch, 3, 1, b, groups=ch)
        pw, _ = _conv_bytes(hw_node, ch, ch, 1, 1, b)
        return extra_reads + dw + pw

    cell = 0
    for lv in (6, 5, 4, 3):  # top-down: upsample read+write, then 2-fuse
        cell += (lv_hw[lv + 1] ** 2 + lv_hw[lv] ** 2) * ch * ACT * b
        cell += fuse_node(lv_hw[lv], 2)
    for lv in (4, 5, 6, 7):  # bottom-up: downsample + 2- or 3-fuse
        cell += (lv_hw[lv - 1] ** 2 + lv_hw[lv] ** 2) * ch * ACT * b
        cell += fuse_node(lv_hw[lv], 2 if lv == 7 else 3)
    fpn += repeats * cell
    stages["bifpn"] = fpn

    # Heads: 2 heads x 5 levels x (3 sepconvs + final sepconv)
    heads = 0
    for out_per_anchor in (4, 1):  # box, class
        for lv in range(3, 8):
            hw_l = lv_hw[lv]
            for _ in range(3):
                heads += fuse_node(hw_l, 1)
            dw, _ = _conv_bytes(hw_l, ch, ch, 3, 1, b, groups=ch)
            pw, _ = _conv_bytes(
                hw_l, ch, out_per_anchor * ANCHORS_PER_CELL, 1, 1, b
            )
            heads += dw + pw
    stages["heads"] = heads

    # Postprocess: read flattened (B,N,4)+(B,N,1) maps + anchors, top-512
    # gather + NMS working set (~B*512 rows several times).
    n_anchors = sum(lv_hw[lv] ** 2 * ANCHORS_PER_CELL for lv in range(3, 8))
    stages["postprocess"] = (
        n_anchors * 5 * ACT * b  # score+delta reads
        + n_anchors * 4 * W      # anchors
        + b * 512 * 6 * W * 4    # prefiltered candidates, a few passes
    )
    stages["_n_anchors"] = n_anchors
    return stages


def measure_stage_ms(pipeline, frames):
    """Marginal ms for the five nested prefix programs + the fused total."""
    import functools

    import jax

    from tools.int8_profile import marginal_ms
    from vbt_tpu.ops.preprocess import preprocess_frames

    model, variables = pipeline._model, pipeline.variables
    size = pipeline.spec.input_size
    dtype = pipeline.dtype

    pre = jax.jit(lambda f: preprocess_frames(f, size, dtype=dtype))

    def p1(v, f):
        images = preprocess_frames(f, size, dtype=dtype)
        return model.apply(v, images, False, "off",
                           method=lambda m, x, train, q: m.backbone(x, train, q))

    def p2(v, f):
        feats = p1(v, f)
        return model.apply(v, feats, False, "off",
                           method=lambda m, ft, train, q: m.fpn(ft, train, q))

    p3 = pipeline._forward       # preprocess + backbone + fpn + heads
    p4 = functools.partial(pipeline._detect, score_threshold=0.0)

    progs = {
        "P0_preprocess": (pre, (frames,)),
        "P1_backbone": (jax.jit(p1), (variables, frames)),
        "P2_bifpn": (jax.jit(p2), (variables, frames)),
        "P3_heads(full fwd)": (p3, (variables, frames)),
        "P4_detect(fused)": (p4, (variables, frames)),
    }
    out = {}
    for name, (fn, args) in progs.items():
        out[name] = marginal_ms(fn, *args, trials=5)
        print(f"{name}: {out[name]:.3f} ms", flush=True)
    return out


def main():
    from vbt_tpu.utils.cache import enable_persistent_cache
    from vbt_tpu.utils.health import require_healthy_tpu

    require_healthy_tpu(context="roofline")
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from vbt_tpu.runtime.pipeline import DetectionPipeline, serving_config

    on_tpu, dtype = serving_config()
    pipeline = DetectionPipeline.from_model_arg(
        "models/efficientdet_lite0_whole.msgpack", use_pallas=on_tpu,
        dtype=dtype,
    )
    size = pipeline.spec.input_size
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, size=(BATCH, size, size, 3)), jnp.uint8
    )

    prefix_ms = measure_stage_ms(pipeline, frames)
    names = list(prefix_ms)
    stage_ms = {names[0]: prefix_ms[names[0]]}
    for a, bn in zip(names, names[1:]):
        stage_ms[bn] = prefix_ms[bn] - prefix_ms[a]

    ideal = analytic_bytes(BATCH, size)
    groups = ideal.pop("_backbone_groups")
    n_anchors = ideal.pop("_n_anchors")
    stage_bytes = {
        "P0_preprocess": ideal["preprocess"],
        "P1_backbone": ideal["backbone"],
        "P2_bifpn": ideal["bifpn"],
        "P3_heads(full fwd)": ideal["heads"],
        "P4_detect(fused)": ideal["postprocess"],
    }

    # XLA's own accounting of the fused program, as the upper cross-check.
    xla_bytes = None
    try:
        ca = (
            pipeline._forward.lower(pipeline.variables, frames)
            .compile().cost_analysis()
        )
        ca = ca[0] if isinstance(ca, list) else ca
        xla_bytes = float(ca.get("bytes accessed", float("nan")))
    except Exception as e:  # cost analysis is best-effort
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    total_ideal = sum(stage_bytes.values())
    fused_ms = prefix_ms["P4_detect(fused)"]
    print(f"\n{'stage':22s} {'ms':>8s} {'ideal GB':>9s} {'GB/s':>8s}")
    rows = []
    for name in names:
        ms = stage_ms[name]
        gb = stage_bytes[name] / 1e9
        gbs = gb / (ms / 1e3) if ms > 0.05 else float("nan")
        rows.append({"stage": name, "ms": round(ms, 3),
                     "ideal_gb": round(gb, 4),
                     "implied_gbs": round(gbs, 1) if gbs == gbs else None})
        print(f"{name:22s} {ms:8.3f} {gb:9.4f} {gbs:8.1f}")
    print(f"{'TOTAL (sum stages)':22s} {sum(stage_ms.values()):8.3f} "
          f"{total_ideal / 1e9:9.4f}")
    print(f"{'fused detect (meas)':22s} {fused_ms:8.3f}")
    print(f"ideal-bytes bound at {HBM_SUSTAINED_GBS:.0f} GB/s sustained: "
          f"{total_ideal / 1e9 / HBM_SUSTAINED_GBS * 1e3:.2f} ms")
    if xla_bytes:
        print(f"XLA cost-analysis bytes (fused fwd): {xla_bytes / 1e9:.2f} GB "
              f"-> {xla_bytes / 1e9 / (fused_ms / 1e3):.0f} GB/s implied")

    record = {
        "batch": BATCH,
        "model": "efficientdet_lite0_whole",
        "prefix_ms": {k: round(v, 3) for k, v in prefix_ms.items()},
        "stage_ms": {k: round(v, 3) for k, v in stage_ms.items()},
        "stage_ideal_bytes": stage_bytes,
        "backbone_group_bytes": groups,
        "n_anchors": n_anchors,
        "total_ideal_bytes": total_ideal,
        "xla_cost_analysis_bytes_fwd": xla_bytes,
        "fused_detect_ms": round(fused_ms, 3),
        "hbm_sustained_gbs_assumed": HBM_SUSTAINED_GBS,
        "rows": rows,
    }
    out = os.path.join(os.path.dirname(__file__), "data_roofline_r5.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
