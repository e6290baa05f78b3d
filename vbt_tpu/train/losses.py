"""Detection losses: sigmoid focal + Huber box regression.

The standard RetinaNet/EfficientDet recipe (alpha=0.25, gamma=1.5,
huber delta=0.1, box weight 50) used by the automl EfficientDet trainer
underneath tflite_model_maker (reference train.py:49).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

ALPHA = 0.25
GAMMA = 1.5
HUBER_DELTA = 0.1
BOX_LOSS_WEIGHT = 50.0


def focal_loss(logits, targets, alpha=ALPHA, gamma=GAMMA):
    """Per-element sigmoid focal loss. ``targets`` in {0, 1}."""
    p = jnp.clip(jnp.asarray(logits, jnp.float32), -30, 30)
    ce = optax.sigmoid_binary_cross_entropy(p, targets)
    prob = jnp.exp(-ce)  # = p_t, probability of the true class
    alpha_t = targets * alpha + (1 - targets) * (1 - alpha)
    return alpha_t * (1 - prob) ** gamma * ce


def huber_loss(pred, target, delta=HUBER_DELTA):
    err = jnp.abs(pred - target)
    quad = jnp.minimum(err, delta)
    return 0.5 * quad**2 + delta * (err - quad)


def detection_loss(
    deltas,  # (B, N, 4) predicted box deltas
    logits,  # (B, N, C) class logits
    box_targets,  # (B, N, 4)
    cls_targets,  # (B, N, C) one-hot
    positive,  # (B, N) bool — anchor is matched to a GT
    ignore,  # (B, N) bool — excluded from the class loss
):
    """Total loss + metrics dict, normalized by the positive count."""
    num_pos = jnp.maximum(positive.sum(), 1.0)

    cls_l = focal_loss(logits, cls_targets)
    cls_l = jnp.where(ignore[..., None], 0.0, cls_l).sum() / num_pos

    box_l = huber_loss(jnp.asarray(deltas, jnp.float32), box_targets)
    box_l = jnp.where(positive[..., None], box_l, 0.0).sum() / (num_pos * 4.0)

    total = cls_l + BOX_LOSS_WEIGHT * box_l
    return total, {
        "loss": total,
        "cls_loss": cls_l,
        "box_loss": box_l,
        "num_pos": num_pos,
    }
