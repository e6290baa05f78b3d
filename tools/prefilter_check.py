"""Prove-or-retire the approx NMS prefilter on real TPU.

Round-4 perf_probe decomposed the batch-128 postprocess (2.38 ms) and
found the exact ``lax.top_k`` candidate prefilter alone costs 1.73 ms —
the Pallas NMS rounds are ~0.1 ms. ``lax.approx_max_k`` (TPU's
single-pass bucketed partial reduction) is the native replacement, but it
may return a slightly different candidate SET (the NMS kernel re-derives
order, so only set membership matters). This tool produces the two pieces
needed to make it the serving default or keep it opt-in:

1. **Numerics**: full 61-image reference test set through the shipped
   lite0 checkpoint (bf16 + Pallas NMS, real Mosaic), exact vs approx
   prefilter. Same matching/budgets as tools/turbo_check.py: counts must
   be equal, confident rows (score > 0.3) must match 1:1 at IoU >= 0.5
   within box/score budgets; the near-zero tail is characterized, not
   gated. Additionally every row above the tracking threshold (0.5, the
   only score any shipped consumer thresholds at — odt.py:70-75 contract)
   is required to agree bitwise in count.
2. **Speed**: marginal-readback full-detect ms/batch at batch 128,
   exact vs approx.

Usage (idle chip, healthy window):  python -m tools.prefilter_check
"""

import glob
import os
import sys
import time

import numpy as np

BUDGET_BOX = 1e-2
BUDGET_SCORE = 5e-2
CONFIDENT = 0.3
TRACK_THRESHOLD = 0.5


def _iou_one_to_many(a, b):
    y1 = np.maximum(a[0], b[:, 0])
    x1 = np.maximum(a[1], b[:, 1])
    y2 = np.minimum(a[2], b[:, 2])
    x2 = np.minimum(a[3], b[:, 3])
    inter = np.clip(y2 - y1, 0, None) * np.clip(x2 - x1, 0, None)
    aa = (a[2] - a[0]) * (a[3] - a[1])
    bb = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa + bb - inter, 1e-9)


def _run(fn, batch, n):
    import jax

    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(batch)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return time.perf_counter() - t0


def _marginal_ms(fn, batch, n_short=4, n_long=12, trials=5):
    _run(fn, batch, 2)
    rates = []
    for _ in range(trials):
        ts = _run(fn, batch, n_short)
        tl = _run(fn, batch, n_long)
        rates.append((tl - ts) / (n_long - n_short))
    rates = [r for r in rates if r > 0]
    if not rates:
        raise RuntimeError("no positive marginal trial (tunnel hiccups)")
    return float(np.median(rates)) * 1e3


def main():
    from vbt_tpu.utils.health import require_healthy_tpu

    require_healthy_tpu(context="prefilter_check")

    import cv2
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
            ckpt, use_pallas=on_tpu, dtype=dtype, prefilter=name
        )
        for name in ("exact", "approx")
    }
    size = pipes["exact"].spec.input_size

    # ---- numerics on the real test set --------------------------------
    files = sorted(glob.glob("/root/reference/data/test/*.jpg"))
    imgs = []
    for f in files:
        img = cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB)
        imgs.append(cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR))
    frames = jnp.asarray(np.stack(imgs), jnp.uint8)
    det = {k: p.detect_batch(frames) for k, p in pipes.items()}
    counts = {k: np.asarray(v.count) for k, v in det.items()}
    boxes = {k: np.asarray(v.boxes, np.float32) for k, v in det.items()}
    scores = {k: np.asarray(v.scores, np.float32) for k, v in det.items()}

    n_img = len(files)
    count_match = int((counts["exact"] == counts["approx"]).sum())
    track_rows_ok = True
    smax = bmax = 0.0
    tail_smax = tail_bmax = 0.0
    unmatched_confident = 0
    tail_rows = total_rows = 0
    for i in range(n_img):
        ce, ca = int(counts["exact"][i]), int(counts["approx"][i])
        n_track_e = int((scores["exact"][i, :ce] >= TRACK_THRESHOLD).sum())
        n_track_a = int((scores["approx"][i, :ca] >= TRACK_THRESHOLD).sum())
        track_rows_ok &= n_track_e == n_track_a
        used = np.zeros(ca, bool)
        for r in range(ce):
            total_rows += 1
            se = scores["exact"][i, r]
            be = boxes["exact"][i, r]
            if ca == 0:
                if se > CONFIDENT:
                    unmatched_confident += 1
                continue
            ious = _iou_one_to_many(be, boxes["approx"][i, :ca])
            ious[used] = -1
            j = int(np.argmax(ious))
            if se > CONFIDENT:
                if ious[j] < 0.5:
                    unmatched_confident += 1
                    continue
                used[j] = True
                smax = max(smax, abs(float(se - scores["approx"][i, j])))
                bmax = max(bmax, float(np.max(np.abs(be - boxes["approx"][i, j]))))
            else:
                tail_rows += 1
                if ious[j] >= 0.5:
                    used[j] = True
                    tail_smax = max(
                        tail_smax, abs(float(se - scores["approx"][i, j])))
                    tail_bmax = max(
                        tail_bmax,
                        float(np.max(np.abs(be - boxes["approx"][i, j]))))

    print(f"images: {n_img}  count-equal: {count_match}/{n_img}  "
          f"track-threshold rows equal: {track_rows_ok}")
    print(f"confident rows: unmatched {unmatched_confident}, "
          f"max |score d| {smax:.2e}, max |box d| {bmax:.2e}")
    print(f"tail rows ({tail_rows}/{total_rows}): "
          f"max |score d| {tail_smax:.2e}, max |box d| {tail_bmax:.2e}")
    ok = (count_match == n_img and track_rows_ok
          and unmatched_confident == 0
          and smax <= BUDGET_SCORE and bmax <= BUDGET_BOX)

    # ---- speed at the serving batch ------------------------------------
    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.integers(0, 255, size=(128, size, size, 3)), jnp.uint8)
    for name, p in pipes.items():
        ms = _marginal_ms(lambda b, p=p: p.detect_batch(b), batch)
        print(f"detect b128 {name}: {ms:7.3f} ms ({128.0 / ms * 1e3:8.0f} fps)",
              flush=True)

    print("PASS" if ok else "FAIL (numerics beyond budget)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
