"""Pallas TPU kernel: fused sigmoid + anchor decode + greedy NMS.

TPU-native replacement for the reference's ``TFLite_Detection_PostProcess``
C++ custom op (consumed at odt.py:64-66; SURVEY.md §2.3 names this kernel as
the required Pallas component). One kernel invocation per image performs:

1. sigmoid over all anchor logits,
2. box decode of *every* anchor against its prior (vector ops on the VPU),
3. ``max_detections`` rounds of greedy NMS: global argmax over the
   (rows, 128)-shaped score planes, one-hot gather of the winner's box,
   vectorized IoU against all anchors, suppression-mask update.

Data layout: anchors are padded to a multiple of 128 and viewed as
(rows, 128) planes so every step is a full-width VPU operation; box
coordinates travel as 4 separate planes (struct-of-arrays). Scores in
(0, 1]; padding lanes carry -inf logits so their sigmoid is exactly 0 and a
selection round terminates when the masked max is 0.

Single-class only (the VBT detector has one class, 'barbell'); the class-
aware multi-class variant runs through the XLA path in
:mod:`vbt_tpu.ops.postprocess`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vbt_tpu.ops.postprocess import Detections

LANES = 128
SLOTS = 128  # output slots (>= max_detections), one VPU row


def _nms_kernel(
    logits_ref,  # (1, R, 128) f32
    deltas_ref,  # (1, 4, R, 128) f32: ty, tx, th, tw planes
    anchors_ref,  # (4, R, 128) f32: yc, xc, h, w planes
    scores_out,  # (1, 1, SLOTS)
    boxes_out,  # (1, 4, SLOTS): ymin, xmin, ymax, xmax per slot
    count_out,  # (1, 1) int32 (SMEM)
    *,
    inv_size: float,
    max_detections: int,
    iou_threshold: float,
    score_threshold: float,
):
    scores = jax.nn.sigmoid(logits_ref[0])  # (R, 128); pads -> 0 exactly

    # Fused anchor decode for every candidate (normalized coordinates).
    ya = anchors_ref[0] * inv_size
    xa = anchors_ref[1] * inv_size
    ha = anchors_ref[2] * inv_size
    wa = anchors_ref[3] * inv_size
    yc = deltas_ref[0, 0] * ha + ya
    xc = deltas_ref[0, 1] * wa + xa
    h = jnp.exp(deltas_ref[0, 2]) * ha
    w = jnp.exp(deltas_ref[0, 3]) * wa
    ymin = yc - h * 0.5
    xmin = xc - w * 0.5
    ymax = yc + h * 0.5
    xmax = xc + w * 0.5
    area = h * w

    rows = scores.shape[0]
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    )
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, SLOTS), 1)

    live0 = scores >= score_threshold
    zeros_row = jnp.zeros((1, SLOTS), jnp.float32)

    def round_fn(i, state):
        live, out_s, out_ymin, out_xmin, out_ymax, out_xmax, count = state
        cand = jnp.where(live, scores, 0.0)
        m = jnp.max(cand)
        found = m > 0.0
        # Deterministic winner: lowest flat index among score ties.
        win_idx = jnp.min(jnp.where(cand == m, flat, jnp.iinfo(jnp.int32).max))
        onehot = (flat == win_idx).astype(jnp.float32)

        def sel(plane):
            return jnp.sum(plane * onehot)

        s_ymin, s_xmin, s_ymax, s_xmax = sel(ymin), sel(xmin), sel(ymax), sel(xmax)
        s_area = sel(area)

        inter_h = jnp.maximum(0.0, jnp.minimum(ymax, s_ymax) - jnp.maximum(ymin, s_ymin))
        inter_w = jnp.maximum(0.0, jnp.minimum(xmax, s_xmax) - jnp.maximum(xmin, s_xmin))
        inter = inter_h * inter_w
        union = area + s_area - inter
        iou = jnp.where(union > 0.0, inter / union, 0.0)

        # The winner suppresses itself (IoU 1) and all heavy overlaps.
        live = live & ~(found & (iou > iou_threshold))
        live = live & ~(found & (flat == win_idx))

        slot = (slot_iota == i) & found
        out_s = jnp.where(slot, m, out_s)
        out_ymin = jnp.where(slot, s_ymin, out_ymin)
        out_xmin = jnp.where(slot, s_xmin, out_xmin)
        out_ymax = jnp.where(slot, s_ymax, out_ymax)
        out_xmax = jnp.where(slot, s_xmax, out_xmax)
        count = count + found.astype(jnp.int32)
        return live, out_s, out_ymin, out_xmin, out_ymax, out_xmax, count

    init = (live0, zeros_row, zeros_row, zeros_row, zeros_row, zeros_row,
            jnp.asarray(0, jnp.int32))
    state = jax.lax.fori_loop(0, max_detections, round_fn, init)
    _, out_s, out_ymin, out_xmin, out_ymax, out_xmax, count = state

    scores_out[0, 0, :] = out_s[0]
    boxes_out[0, 0, :] = out_ymin[0]
    boxes_out[0, 1, :] = out_xmin[0]
    boxes_out[0, 2, :] = out_ymax[0]
    boxes_out[0, 3, :] = out_xmax[0]
    count_out[0, 0] = count


@functools.partial(
    jax.jit,
    static_argnames=(
        "input_size",
        "max_detections",
        "iou_threshold",
        "score_threshold",
        "interpret",
    ),
)
def detection_postprocess_pallas(
    deltas: jnp.ndarray,  # (B, N, 4)
    logits: jnp.ndarray,  # (B, N, 1) — single class
    anchors: jnp.ndarray,  # (N, 4) [yc, xc, h, w] pixels
    input_size: int,
    max_detections: int = 25,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.0,
    interpret: bool = False,
) -> Detections:
    """Batched fused decode+NMS via the Pallas kernel.

    Same contract as :func:`vbt_tpu.ops.postprocess.detection_postprocess`
    restricted to one class.
    """
    if logits.shape[-1] != 1:
        raise ValueError("Pallas NMS kernel is single-class; use the XLA path")
    b, n, _ = deltas.shape
    rows = -(-n // LANES)
    pad = rows * LANES - n

    logits2 = jnp.pad(
        logits[..., 0].astype(jnp.float32),
        ((0, 0), (0, pad)),
        constant_values=-jnp.inf,
    ).reshape(b, rows, LANES)
    deltas2 = (
        jnp.pad(deltas.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
        .transpose(0, 2, 1)
        .reshape(b, 4, rows, LANES)
    )
    anchors2 = (
        jnp.pad(anchors.astype(jnp.float32), ((0, pad), (0, 0)))
        .transpose(1, 0)
        .reshape(4, rows, LANES)
    )

    kernel = functools.partial(
        _nms_kernel,
        inv_size=1.0 / input_size,
        max_detections=max_detections,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
    )
    scores_out, boxes_out, count_out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, rows, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, rows, LANES), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, SLOTS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, SLOTS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, SLOTS), jnp.float32),
            jax.ShapeDtypeStruct((b, 4, SLOTS), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        ],
        interpret=interpret,
    )(logits2, deltas2, anchors2)

    boxes = boxes_out[:, :, :max_detections].transpose(0, 2, 1)  # (B, D, 4)
    return Detections(
        count=count_out[:, 0],
        scores=scores_out[:, 0, :max_detections],
        classes=jnp.zeros((b, max_detections), jnp.int32),
        boxes=boxes,
    )
