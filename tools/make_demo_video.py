"""Compose a demo exercise video from a real test image.

The reference's sample videos are not in the snapshot (gitignored,
GDrive-hosted — SURVEY.md §2.5), so this synthesizes one: a camera window
pans sinusoidally over a real annotated test image, making the barbell
plate move vertically through the frame like reps. The trained detector
then tracks a *real* plate end to end.

Usage: python tools/make_demo_video.py OUT.mp4 [--reps 4] [--fps 30]
"""

import os
import sys

import click
import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from vbt_tpu.contract.parsers import read_voc_annotations  # noqa: E402

DATA = "/root/reference/data/test"


@click.command()
@click.argument("out", type=str)
@click.option("--reps", default=4, type=int)
@click.option("--fps", default=30.0, type=float)
@click.option("--seconds", default=12.0, type=float)
def main(out, reps, fps, seconds):
    annotations = read_voc_annotations(DATA)
    # Pick an image whose plate box leaves room to pan vertically.
    for fname, boxes in sorted(annotations.items()):
        img = cv2.imread(os.path.join(DATA, fname))
        if img is None or len(boxes) == 0:
            continue
        h, w, _ = img.shape
        ymin, xmin, ymax, xmax = boxes[0]
        box_h = ymax - ymin
        if h - (ymax - ymin) > h * 0.5 and box_h < h * 0.35 and w >= 400:
            break

    win_h = int(h * 0.55)
    # Pan range keeping the plate fully inside the window.
    lo = max(0, ymax - win_h + 5)
    hi = min(h - win_h, max(lo, ymin - 5))
    frames = int(seconds * fps)
    writer = cv2.VideoWriter(out, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, win_h))
    for t in range(frames):
        phase = reps * 2 * np.pi * t / frames
        y0 = int(lo + (0.5 - 0.5 * np.cos(phase)) * (hi - lo))
        writer.write(img[y0 : y0 + win_h])
    writer.release()
    print(f"{out}: {frames} frames {w}x{win_h} from {fname} (plate box {boxes[0]})")


if __name__ == "__main__":
    main()
