"""COCO-style model evaluation on a VOC directory (original image space)."""

from __future__ import annotations

import glob
import os

import numpy as np

from vbt_tpu.contract.parsers import read_voc_annotations
from vbt_tpu.train.coco_eval import coco_metrics


def evaluate_model(pipeline, data_dir: str, label: str = "barbell") -> dict:
    """Run the detection pipeline over every annotated image and score it.

    Detections come back normalized; they are scaled to original pixels so
    IoU is computed in the image's true geometry (as the reference's
    model-maker evaluator does, train.py:64)."""
    import cv2

    annotations = read_voc_annotations(data_dir, label=label)
    jpgs = {os.path.basename(p): p for p in glob.glob(os.path.join(data_dir, "*.jpg"))}

    # Host-resize everything to the model input so the device program
    # compiles once (per-image original shapes would retrace per image).
    size = pipeline.spec.input_size
    images, dims, ground_truths = [], [], []
    for fname, gt in sorted(annotations.items()):
        if fname not in jpgs:
            continue
        img = cv2.cvtColor(cv2.imread(jpgs[fname]), cv2.COLOR_BGR2RGB)
        dims.append(img.shape[:2])
        images.append(cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR))
        ground_truths.append(gt.astype(np.float64))

    detections = []
    batch = 32
    for i in range(0, len(images), batch):
        chunk = images[i : i + batch]
        pad = batch - len(chunk)
        frames = np.stack(chunk + [chunk[-1]] * pad)
        det = pipeline.detect_batch(frames)
        for j in range(len(chunk)):
            h, w = dims[i + j]
            n = int(det.count[j])
            boxes = np.asarray(det.boxes[j][:n], np.float64) * np.array([h, w, h, w])
            detections.append(
                {"boxes": boxes, "scores": np.asarray(det.scores[j][:n], np.float64)}
            )
    return coco_metrics(detections, ground_truths)
