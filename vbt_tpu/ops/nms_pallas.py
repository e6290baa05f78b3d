"""Pallas TPU kernel: greedy NMS over top-K decoded candidates.

TPU-native replacement for the reference's ``TFLite_Detection_PostProcess``
C++ custom op (consumed at odt.py:64-66; SURVEY.md §2.3 names this kernel as
the required Pallas component).

Pipeline, mirroring the XLA reference implementation in
:mod:`vbt_tpu.ops.postprocess` (so the two paths agree bit-for-bit):

1. **Candidate prefilter (XLA)**: exact ``lax.top_k`` keeps the K
   highest-scoring anchors per image (K = 512; bit-identical to K = 1024
   on the full reference test set, measured round 3).
   ``prefilter='approx'`` swaps in ``lax.approx_max_k`` (single-pass
   bucketed max). Round-4 adjudication (tools/prefilter_check.py, real
   chip): numerics are clean (all 61 test images count-equal, confident
   rows bit-identical, tail score deltas <=5e-4) but the swap is
   measured NEUTRAL inside the fused detect program (12.75 vs 12.66
   ms/batch at 128, same window) — the 1.73 ms that `lax.top_k` costs
   STANDALONE (tools/perf_probe.py) is overlapped by XLA's scheduler
   in-program. Exact stays the default: the exactness is free.
2. **Decode after gather (XLA)**: gather the K candidates' deltas and
   anchor priors, then decode only those — decoding all N anchors first
   materializes a (B, N, 4) f32 tensor whose minor-dim-4 layout pads to
   full VPU lanes in HBM and costs several ms of pure relayout traffic.
3. **Pallas kernel** (one grid step per image): fused sigmoid over candidate
   logits + ``max_detections`` statically-unrolled greedy-NMS rounds:
   global argmax over the (8, 128) score tile, one-hot gather of the
   winner's box, vectorized IoU against all candidates, suppression-mask
   update.

Data layout: struct-of-arrays — scores as an (8, 128) tile, box coordinates
as 4 separate tiles — so every step is a full-width VPU operation. Scores
live in (0, 1]; padding lanes carry -inf logits so their sigmoid is exactly
0 and a selection round terminates when the masked max is 0.

Single-class only (the VBT detector has one class, 'barbell'); the
class-aware multi-class variant runs through the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vbt_tpu.ops.postprocess import NUM_CANDIDATES, Detections

LANES = 128
SLOTS = 128  # output slots (>= max_detections), one VPU row
# NUM_CANDIDATES (the top-K prefilter width) is shared with the XLA oracle —
# one constant in vbt_tpu.ops.postprocess — so the two lanes prefilter
# identically. See that module's docstring for the 512-vs-256 measurement.


def _imax(x):
    """max over the per-image candidate block (last two axes), keepdims."""
    return jnp.max(jnp.max(x, axis=2, keepdims=True), axis=1, keepdims=True)


def _imin(x):
    return jnp.min(jnp.min(x, axis=2, keepdims=True), axis=1, keepdims=True)


def _isum(x):
    return jnp.sum(jnp.sum(x, axis=2, keepdims=True), axis=1, keepdims=True)


def _nms_kernel(
    logits_ref,  # (T, R, 128) f32 — candidate logits per image tile
    boxes_ref,  # (T, 4, R, 128) f32: ymin, xmin, ymax, xmax planes (decoded)
    scores_out,  # (T, 1, SLOTS)
    boxes_out,  # (T, 4, SLOTS): ymin, xmin, ymax, xmax per slot
    count_out,  # (T, 1, SLOTS) int32 (lane 0 carries the count)
    *,
    max_detections: int,
    iou_threshold: float,
    score_threshold: float,
):
    """Greedy NMS, VECTORIZED over a tile of T images.

    Every round's reduction/selection runs on (T, R, 128) arrays — one
    round advances all T images at once. The original one-image-per-grid-
    step form spent most of its time in per-step overhead and narrow
    (R, 128) reductions (measured round 3); tiling images recovers full
    VPU width at identical per-image semantics."""
    scores = jax.nn.sigmoid(logits_ref[...])  # (T, R, 128); pads -> 0 exactly

    ymin = boxes_ref[:, 0]  # (T, R, 128)
    xmin = boxes_ref[:, 1]
    ymax = boxes_ref[:, 2]
    xmax = boxes_ref[:, 3]
    area = (ymax - ymin) * (xmax - xmin)

    t, rows, _ = scores.shape
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (t, rows, LANES), 1) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (t, rows, LANES), 2)
    )
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (t, 1, SLOTS), 2)

    live0 = scores >= score_threshold
    zeros_slots = jnp.zeros((t, 1, SLOTS), jnp.float32)

    def round_fn(i, state):
        live, out_s, out_ymin, out_xmin, out_ymax, out_xmax, count = state
        cand = jnp.where(live, scores, 0.0)
        m = _imax(cand)  # (T, 1, 1)
        found = m > 0.0
        # Deterministic winner per image: lowest flat index among ties.
        win_idx = _imin(jnp.where(cand == m, flat, jnp.iinfo(jnp.int32).max))
        onehot = (flat == win_idx).astype(jnp.float32)

        def sel(plane):
            return _isum(plane * onehot)  # (T, 1, 1)

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

        slot = (slot_iota == i) & found  # (T, 1, SLOTS)
        out_s = jnp.where(slot, m, out_s)
        out_ymin = jnp.where(slot, s_ymin, out_ymin)
        out_xmin = jnp.where(slot, s_xmin, out_xmin)
        out_ymax = jnp.where(slot, s_ymax, out_ymax)
        out_xmax = jnp.where(slot, s_xmax, out_xmax)
        count = count + found.astype(jnp.int32)
        return live, out_s, out_ymin, out_xmin, out_ymax, out_xmax, count

    # Statically unrolled selection rounds: Mosaic currently fails to
    # legalize scf.for with large vector carries, and max_detections is a
    # small compile-time constant (25).
    state = (live0, zeros_slots, zeros_slots, zeros_slots, zeros_slots,
             zeros_slots, jnp.zeros((t, 1, 1), jnp.int32))
    for i in range(max_detections):
        state = round_fn(i, state)
    _, out_s, out_ymin, out_xmin, out_ymax, out_xmax, count = state

    scores_out[...] = out_s
    boxes_out[:, 0, :] = out_ymin[:, 0, :]
    boxes_out[:, 1, :] = out_xmin[:, 0, :]
    boxes_out[:, 2, :] = out_ymax[:, 0, :]
    boxes_out[:, 3, :] = out_xmax[:, 0, :]
    count_out[...] = jnp.broadcast_to(count, (t, 1, SLOTS)).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "input_size",
        "max_detections",
        "iou_threshold",
        "score_threshold",
        "num_candidates",
        "interpret",
        "prefilter",
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
    num_candidates: int = NUM_CANDIDATES,
    interpret: bool = False,
    prefilter: str = "exact",
) -> Detections:
    """Batched fused decode + top-K prefilter + Pallas NMS.

    Same contract as :func:`vbt_tpu.ops.postprocess.detection_postprocess`
    restricted to one class.
    """
    if logits.shape[-1] != 1:
        raise ValueError("Pallas NMS kernel is single-class; use the XLA path")
    from vbt_tpu.models.anchors import decode_boxes

    b, n, _ = deltas.shape
    k = min(num_candidates, n)
    rows = -(-k // LANES)
    pad = rows * LANES - k

    # Stage 1 (XLA): top-K candidates per image. The NMS kernel re-derives
    # order with its per-round global argmax, so the prefilter only has to
    # deliver the candidate SET; 'approx' trades tail-score exactness for
    # speed (module docstring).
    flat_logits = logits[..., 0].astype(jnp.float32)
    if prefilter == "approx":
        top_logits, top_idx = jax.lax.approx_max_k(flat_logits, k)
    else:
        top_logits, top_idx = jax.lax.top_k(flat_logits, k)

    # Stage 2 (XLA): gather the K candidates' deltas + anchors, then decode
    # only those. Decoding after the gather avoids materializing the
    # (B, N, 4) f32 decoded-box tensor — a minor-dim-4 layout that pads to
    # full VPU lanes in HBM (round-3 probe: decode-all standalone costs
    # several ms purely from that relayout traffic).
    top_deltas = jnp.take_along_axis(
        deltas.astype(jnp.float32), top_idx[..., None], axis=1
    )
    top_anchors = jnp.asarray(anchors, jnp.float32)[top_idx]
    top_boxes = decode_boxes(top_deltas, top_anchors) / input_size

    # Tile images per grid step so each NMS round runs as full-width VPU
    # work over T images at once. Pad the batch to a tile multiple with
    # -inf logits -> zero scores -> count 0; sliced off below. T is capped
    # at 16: the 25 statically-unrolled rounds' (T, R, 128) temporaries all
    # stay live in Mosaic's scoped VMEM (no cross-round buffer reuse —
    # measured 32.5 MB at T=64 vs the 16 MB cap).
    tile = min(b, 16)
    bpad = -(-b // tile) * tile - b

    logits2 = jnp.pad(top_logits, ((0, bpad), (0, pad)),
                      constant_values=-jnp.inf)
    logits2 = logits2.reshape(b + bpad, rows, LANES)
    boxes2 = (
        jnp.pad(top_boxes, ((0, bpad), (0, pad), (0, 0)))
        .transpose(0, 2, 1)
        .reshape(b + bpad, 4, rows, LANES)
    )

    kernel = functools.partial(
        _nms_kernel,
        max_detections=max_detections,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
    )
    scores_out, boxes_out, count_out = pl.pallas_call(
        kernel,
        grid=((b + bpad) // tile,),
        in_specs=[
            pl.BlockSpec((tile, rows, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4, rows, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, 1, SLOTS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4, SLOTS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1, SLOTS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b + bpad, 1, SLOTS), jnp.float32),
            jax.ShapeDtypeStruct((b + bpad, 4, SLOTS), jnp.float32),
            jax.ShapeDtypeStruct((b + bpad, 1, SLOTS), jnp.int32),
        ],
        interpret=interpret,
    )(logits2, boxes2)

    boxes = boxes_out[:b, :, :max_detections].transpose(0, 2, 1)  # (B, D, 4)
    return Detections(
        count=count_out[:b, 0, 0],
        scores=scores_out[:b, 0, :max_detections],
        classes=jnp.zeros((b, max_detections), jnp.int32),
        boxes=boxes,
    )
