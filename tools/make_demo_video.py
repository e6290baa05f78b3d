"""Compose a demo exercise video (with analytic ground truth) from a real
test image.

The reference's sample videos are not in the snapshot (gitignored,
GDrive-hosted — SURVEY.md §2.5), so this synthesizes one: a camera window
pans sinusoidally over a real annotated test image, making the barbell
plate move vertically through the frame like reps. The trained detector
then tracks a *real* plate end to end.

Because the pan is programmed, the plate's frame-coordinate trajectory is
known ANALYTICALLY — ``--trajectory_out`` emits it as CSV (time, x, y,
norm_plate_height, norm_plate_width in the track-dataframe convention), so
the full detector->tracker->phase pipeline can be validated against
ground-truth ROM/ACV with no manual annotation (the north star's 1%
per-rep budget; tests/test_e2e_acv.py).

Usage: python tools/make_demo_video.py OUT.mp4 [--reps 4] [--fps 30]
       [--trajectory_out traj.csv]
"""

import os
import sys

import click
import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from vbt_tpu.contract.parsers import read_voc_annotations  # noqa: E402

DATA = "/root/reference/data/test"


def synthesize(out, reps=4, fps=30.0, seconds=12.0, trajectory_out=None,
               image=None):
    """Render the pan video; return (n_frames, analytic trajectory dict).

    The trajectory is exact by construction: the plate's annotated box is
    fixed in the source image and the window origin y0(t) is scripted, so
    the plate center in frame coordinates is (box_center - origin) and the
    plate size is constant.

    ``image`` pins a specific test-set file instead of the first picker
    match (the quick e2e lane pins a single-annotated-plate image so the
    max-travel track selection cannot land on a second plate panning with
    the same amplitude — tests/test_e2e_acv.py).
    """
    annotations = read_voc_annotations(DATA)
    if image is not None:
        annotations = {image: annotations[image]}
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
    cx = (xmin + xmax) / 2.0
    cy = (ymin + ymax) / 2.0
    traj = {"time": [], "x": [], "y": [],
            "norm_plate_height": [], "norm_plate_width": []}
    for t in range(frames):
        phase = reps * 2 * np.pi * t / frames
        y0 = int(lo + (0.5 - 0.5 * np.cos(phase)) * (hi - lo))
        writer.write(img[y0 : y0 + win_h])
        # track.py convention: time = frame_count / fps with frame_count
        # starting at 1 (reference track.py:227-234).
        traj["time"].append((t + 1) / fps)
        traj["x"].append(cx / w)
        traj["y"].append((cy - y0) / win_h)
        traj["norm_plate_height"].append((ymax - ymin) / win_h)
        traj["norm_plate_width"].append((xmax - xmin) / w)
    writer.release()

    if trajectory_out:
        import pandas as pd

        pd.DataFrame(traj).to_csv(trajectory_out, index=False)
    return frames, traj, (fname, boxes[0], (w, win_h))


@click.command()
@click.argument("out", type=str)
@click.option("--reps", default=4, type=int)
@click.option("--fps", default=30.0, type=float)
@click.option("--seconds", default=12.0, type=float)
@click.option("--trajectory_out", default=None, type=str,
              help="CSV path for the analytic plate trajectory.")
def main(out, reps, fps, seconds, trajectory_out):
    frames, _, (fname, box, dims) = synthesize(
        out, reps, fps, seconds, trajectory_out
    )
    print(f"{out}: {frames} frames {dims[0]}x{dims[1]} from {fname} "
          f"(plate box {box})")


if __name__ == "__main__":
    main()
