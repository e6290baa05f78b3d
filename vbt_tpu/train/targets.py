"""Anchor target assignment for detection training.

RetinaNet-style max-IoU assignment, fully vectorized and jittable: anchors
with best-IoU >= 0.5 are positive, < 0.4 negative, in between ignored; the
best anchor for every ground-truth box is forced positive so no GT goes
unmatched. Ground-truth boxes arrive as fixed-capacity padded arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from vbt_tpu.models.anchors import encode_boxes

POS_IOU = 0.5
NEG_IOU = 0.4


def _corners(anchors):
    """[yc, xc, h, w] -> [ymin, xmin, ymax, xmax]."""
    yc, xc, h, w = jnp.moveaxis(anchors, -1, 0)
    return jnp.stack([yc - h / 2, xc - w / 2, yc + h / 2, xc + w / 2], axis=-1)


def _pairwise_iou(a, b, eps=1e-9):
    """(N,4) x (G,4) corner boxes -> (N,G)."""
    a = a[:, None, :]
    b = b[None, :, :]
    ih = jnp.maximum(
        0.0, jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0])
    )
    iw = jnp.maximum(
        0.0, jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1])
    )
    inter = ih * iw
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / (area_a + area_b - inter + eps)


def assign_targets(anchors, gt_boxes, gt_valid, num_classes: int = 1):
    """Per-image anchor labels.

    anchors: (N, 4) [yc,xc,h,w]; gt_boxes: (G, 4) [ymin,xmin,ymax,xmax]
    (padded); gt_valid: (G,) bool. Returns (box_targets (N,4),
    cls_targets (N,C), positive (N,), ignore (N,)).
    """
    n = anchors.shape[0]
    corners = _corners(anchors)
    iou = _pairwise_iou(corners, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)

    best_gt = jnp.argmax(iou, axis=1)  # (N,)
    best_iou = jnp.max(iou, axis=1)

    positive = best_iou >= POS_IOU
    ignore = (best_iou >= NEG_IOU) & (best_iou < POS_IOU)

    # Force-match the best anchor of each GT box (ties to the first anchor).
    best_anchor_per_gt = jnp.argmax(iou, axis=0)  # (G,)
    forced = jnp.zeros((n,), bool).at[best_anchor_per_gt].max(gt_valid)
    # Invalid GT rows scatter to index n -> dropped.
    forced_gt = (
        jnp.full((n,), -1, jnp.int32)
        .at[jnp.where(gt_valid, best_anchor_per_gt, n)]
        .set(jnp.arange(gt_boxes.shape[0], dtype=jnp.int32), mode="drop")
    )
    best_gt = jnp.where(forced & (forced_gt >= 0), forced_gt, best_gt)
    positive = positive | forced
    ignore = ignore & ~forced

    matched = gt_boxes[best_gt]
    box_targets = encode_boxes(matched, anchors)
    box_targets = jnp.where(positive[:, None], box_targets, 0.0)

    # Single-class one-hot (class 0 == barbell).
    cls_targets = jnp.zeros((n, num_classes), jnp.float32)
    cls_targets = cls_targets.at[:, 0].set(positive.astype(jnp.float32))

    return box_targets, cls_targets, positive, ignore
