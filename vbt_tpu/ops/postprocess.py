"""Detection postprocess: anchor decode + class-aware NMS (XLA reference).

Behavioural replacement for the reference's ``TFLite_Detection_PostProcess``
custom C++ op, whose four outputs odt.py:64-66 consumes as
(count, scores, classes, boxes) with at most 25 final boxes (verified against
dfs/eval_detections.pkl.gz: exactly 25 detections per image at threshold 0).

This module is the jit-compiled XLA implementation — also the numerical
oracle for the Pallas kernel in :mod:`vbt_tpu.ops.nms_pallas`. Boxes are
emitted as [ymin, xmin, ymax, xmax] in normalized image coordinates, sorted
by descending score, exactly the contract odt.py expects.

Algorithm (all static shapes, fused under jit):
1. sigmoid scores, per-class;
2. top-K candidate prefilter per class (K = ``NUM_CANDIDATES``; see below);
3. decode the K candidates' box deltas against their anchors;
4. greedy NMS: max_detections rounds of (pick argmax, suppress IoU overlap
   within the same class).

``NUM_CANDIDATES`` is shared with the Pallas lane (:mod:`nms_pallas`
imports it) so the two paths prefilter identically. 512 is the minimum
bit-identical width vs an exhaustive K=1024 on the full 61-image reference
test set (round-3 measurement); 256 is NOT enough — greedy suppression can
exhaust the candidate pool before the 25-detection contract fills, so a
narrower prefilter CAN change the output.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


# Shared prefilter width for BOTH the XLA oracle and the Pallas kernel
# (nms_pallas re-exports this). Minimum width that is bit-identical to an
# exhaustive K=1024 prefilter on the full reference test set.
NUM_CANDIDATES = 512


class Detections(NamedTuple):
    """Fixed-capacity detections for one image (or a leading batch dim)."""

    count: jnp.ndarray  # () int32 — number of valid rows
    scores: jnp.ndarray  # (max_detections,)
    classes: jnp.ndarray  # (max_detections,) int32
    boxes: jnp.ndarray  # (max_detections, 4) normalized [ymin,xmin,ymax,xmax]


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of [ymin,xmin,ymax,xmax] box sets (N,4) x (M,4) -> (N,M)."""
    a = a[:, None, :]
    b = b[None, :, :]
    inter_h = jnp.maximum(
        0.0, jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0])
    )
    inter_w = jnp.maximum(
        0.0, jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1])
    )
    inter = inter_h * inter_w
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _single_image_postprocess(
    deltas, logits, anchors, input_size, max_detections, iou_threshold,
    score_threshold, num_candidates,
):
    num_classes = logits.shape[-1]
    scores_all = jax.nn.sigmoid(logits.astype(jnp.float32))  # (N, C)

    # Candidate prefilter: per-anchor best class (class-aware NMS still holds
    # because candidates carry their class id).
    best_class = jnp.argmax(scores_all, axis=-1).astype(jnp.int32)
    best_score = jnp.max(scores_all, axis=-1)
    k = min(num_candidates, best_score.shape[0])
    top_scores, top_idx = jax.lax.top_k(best_score, k)
    top_classes = best_class[top_idx]

    from vbt_tpu.models.anchors import decode_boxes

    boxes = decode_boxes(deltas.astype(jnp.float32)[top_idx], anchors[top_idx])
    boxes = boxes / input_size  # normalized image coordinates

    ious = iou_matrix(boxes, boxes)
    same_class = top_classes[:, None] == top_classes[None, :]
    suppress_pair = (ious > iou_threshold) & same_class

    valid = top_scores >= score_threshold

    def select(state, _):
        suppressed, out_count = state
        avail = valid & ~suppressed
        cand_scores = jnp.where(avail, top_scores, -jnp.inf)
        best = jnp.argmax(cand_scores)
        found = cand_scores[best] > -jnp.inf
        # Suppress same-class overlaps of the winner (and the winner itself).
        suppressed = suppressed | (found & suppress_pair[best])
        suppressed = suppressed.at[best].set(suppressed[best] | found)
        out_count = out_count + found.astype(jnp.int32)
        row = (
            found,
            jnp.where(found, top_scores[best], 0.0),
            jnp.where(found, top_classes[best], 0),
            jnp.where(found, boxes[best], jnp.zeros(4, boxes.dtype)),
        )
        return (suppressed, out_count), row

    (_, count), (found, out_scores, out_classes, out_boxes) = jax.lax.scan(
        select,
        (jnp.zeros(k, bool), jnp.asarray(0, jnp.int32)),
        None,
        length=max_detections,
    )
    del found, num_classes
    return Detections(count=count, scores=out_scores, classes=out_classes, boxes=out_boxes)


@functools.partial(
    jax.jit,
    static_argnames=(
        "input_size",
        "max_detections",
        "iou_threshold",
        "score_threshold",
        "num_candidates",
    ),
)
def detection_postprocess(
    deltas: jnp.ndarray,
    logits: jnp.ndarray,
    anchors: jnp.ndarray,
    input_size: int,
    max_detections: int = 25,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.0,
    num_candidates: int = NUM_CANDIDATES,
) -> Detections:
    """Batched decode + NMS. ``deltas`` (B,N,4), ``logits`` (B,N,C)."""
    fn = functools.partial(
        _single_image_postprocess,
        input_size=input_size,
        max_detections=max_detections,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
        num_candidates=num_candidates,
    )
    return jax.vmap(lambda d, l: fn(d, l, anchors))(deltas, logits)
