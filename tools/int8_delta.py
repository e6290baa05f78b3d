"""COCO-metric delta of the int8 PTQ path vs float for one checkpoint.

The reference deploys an int8 TFLite model (reference train.py:67); our
TPU-native equivalent is QuantConv post-training quantization
(models/quant.py) behind ``DetectionPipeline.calibrate``. RESULTS.md
carries a <1% AP75 budget for that path, and checkpoint selection gates on
it (a round-2 lite0 candidate was rejected for a 1.6% int8 delta) — so the
delta must be re-measured every time a new checkpoint ships (VERDICT r3,
item 3). This tool makes that re-check one command instead of a notebook.

Prints float and int8 COCO metrics plus the deltas; exit code 1 if the
AP75 delta exceeds the budget.

Usage (idle chip):
  python -m tools.int8_delta models/efficientdet_lite1_whole.msgpack
"""

import glob
import os
import sys

import click
import numpy as np


@click.command()
@click.argument("checkpoint")
@click.option("--data_dir", default="/root/reference/data", show_default=True)
@click.option("--calib_n", default=8, show_default=True,
              help="Calibration images sampled from the train split.")
@click.option("--budget", default=0.01, show_default=True,
              help="Allowed |AP75_int8 - AP75_float| (absolute).")
def main(checkpoint, data_dir, calib_n, budget):
    from vbt_tpu.utils.cache import enable_persistent_cache
    from vbt_tpu.utils.health import require_healthy_tpu

    enable_persistent_cache()
    require_healthy_tpu(context="int8_delta")

    import cv2

    from vbt_tpu.runtime.pipeline import DetectionPipeline
    from vbt_tpu.train.evaluate import evaluate_model

    pipe = DetectionPipeline.from_model_arg(checkpoint)
    test_dir = os.path.join(data_dir, "test")

    # Calibration: real train images at the model input size (the same
    # distribution the reference's TFLite converter calibrates on). The set
    # is deterministic (first `calib_n` sorted train jpgs) and PRINTED so the
    # gate's methodology baseline is pinned in any capture of this tool.
    size = pipe.spec.input_size
    train_jpgs = sorted(glob.glob(os.path.join(data_dir, "train", "*.jpg")))
    if not train_jpgs:
        raise SystemExit(f"no train images under {data_dir}/train")
    frames = []
    calib_used = []
    for p in train_jpgs:
        if len(frames) >= calib_n:
            break
        img = cv2.imread(p)
        if img is None:
            print(f"WARNING: skipping unreadable calibration image {p}",
                  file=sys.stderr)
            continue
        frames.append(
            cv2.resize(cv2.cvtColor(img, cv2.COLOR_BGR2RGB), (size, size))
        )
        calib_used.append(os.path.basename(p))
    if len(frames) < calib_n:
        raise SystemExit(
            f"only {len(frames)} readable calibration images (need {calib_n})"
        )
    frames = np.stack(frames)
    print(f"calib set ({len(calib_used)}): {' '.join(calib_used)}")

    m_float = evaluate_model(pipe, test_dir)
    m_int8 = evaluate_model(pipe.calibrate(frames), test_dir)

    def fmt(m):
        return f"AP {m['AP']:.4f} AP50 {m['AP50']:.4f} AP75 {m['AP75']:.4f}"

    print(f"float: {fmt(m_float)}")
    print(f"int8 : {fmt(m_int8)}")
    delta75 = m_int8["AP75"] - m_float["AP75"]
    print(f"delta: AP {m_int8['AP'] - m_float['AP']:+.4f} "
          f"AP50 {m_int8['AP50'] - m_float['AP50']:+.4f} "
          f"AP75 {delta75:+.4f} (budget -{budget})")
    # The shipping gate cares about REGRESSIONS only: an int8 path that
    # improves AP75 is fine (a large positive delta would be surprising but
    # is not a reason to block a checkpoint).
    if delta75 < -budget:
        print("FAIL: int8 AP75 regression exceeds budget", file=sys.stderr)
        sys.exit(1)
    if delta75 > budget:
        print(f"note: int8 improves AP75 by {delta75:+.4f} (> budget "
              "magnitude) — unusual but not gated", file=sys.stderr)
    print("OK")


if __name__ == "__main__":
    main()
