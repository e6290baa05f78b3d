"""Pallas TPU kernel: fully-fused MBConv block (expand -> depthwise -> project).

Why: the EfficientNet-lite forward is HBM-bandwidth-bound on v5e (round-3
probe: 5.4 GB accessed per 128-batch vs a ~0.23 GF/frame compute load; the
measured forward runs at ~88% of the bandwidth roofline). The dominant
traffic is the 6x-expanded MBConv intermediate: XLA materializes it to HBM
three times per block (expand write, depthwise read+write, project read).
This kernel keeps the whole expanded tensor in VMEM — per block, only the
block input and output cross HBM.

Design (per grid step = one image):
- layout is channel-major flat: (C, P) with P = H*W spatial positions on
  the lane axis — C is small (16..240) and sits on sublanes; P is large
  and 128-lane friendly.
- expand / project 1x1 convs are MXU matmuls (C_out, C_in) @ (C_in, P).
- the depthwise k x k conv is a tap sum: for each tap, a static lane-roll
  of the expanded tensor times a per-channel weight column, masked where
  the true input coordinate falls outside the image (mask also covers the
  roll's wraparound, which only lands on invalid positions).
- stride 2 blocks take their input pre-split into FOUR phase planes
  (even/odd rows x even/odd cols, each plane (H/2, W/2) row-major): a
  1x1 conv commutes with any column permutation, so the expand runs per
  plane, and every strided tap becomes a plain (plane, shift) pair on the
  OUTPUT grid — no strided lane access anywhere (Mosaic-hostile).
- BatchNorm is folded into the conv weights/biases on the host
  (inference only), ReLU6 applied in-kernel.

SAME-padding tap enumeration matches XLA's asymmetric padding exactly
(pad_total = (out-1)*stride + k - in, pad_lo = pad_total // 2).

The reference has no counterpart (its conv stack is the TFLite C++
interpreter, SURVEY.md §2.3); this is the TPU-native serving fast path.
The flax/XLA block (models/efficientnet_lite.py MBConvBlock) remains the
numerical oracle; equality is pinned by tests/test_fused_mbconv.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclass(frozen=True)
class TapSpec:
    tap: int     # index into the (k*k) depthwise weight columns
    plane: int   # input phase plane (always 0 for stride 1)
    shift: int   # lane shift on the output grid: term[q] = h_plane[q+shift]
    dy: int      # true input row offset relative to stride*yo
    dx: int      # true input col offset relative to stride*xo
    needs_mask: bool


def enumerate_taps(k: int, stride: int, h: int, w: int) -> tuple[list[TapSpec], int, int]:
    """(taps, Ho, Wo) for a SAME-padded k x k depthwise at the given stride."""
    assert stride in (1, 2), "phase-plane decomposition covers strides 1/2"
    ho, wo = -(-h // stride), -(-w // stride)
    # SAME padding is computed per axis (XLA semantics): h and w can differ.
    pad_lo_y = max((ho - 1) * stride + k - h, 0) // 2
    pad_lo_x = max((wo - 1) * stride + k - w, 0) // 2
    taps = []
    for ty in range(k):
        dy = ty - pad_lo_y
        for tx in range(k):
            dx = tx - pad_lo_x
            if stride == 1:
                plane, oy, ox = 0, dy, dx
            else:
                py, px = dy % 2, dx % 2
                plane = py * 2 + px
                oy, ox = (dy - py) // 2, (dx - px) // 2
            # Any output position whose true input coordinate is out of
            # bounds must be masked; interior taps need no mask.
            needs_mask = (
                dy < 0 or stride * (ho - 1) + dy >= h
                or dx < 0 or stride * (wo - 1) + dx >= w
            )
            taps.append(TapSpec(ty * k + tx, plane, oy * wo + ox, dy, dx, needs_mask))
    return taps, ho, wo


def _mbconv_kernel(
    x_ref,    # (1, Cin, planes, Po_in) — phase planes of the input
    we_ref,   # (Cmid/nj, Cin) bf16 (BN-folded)  [placeholder if not has_expand]
    be_ref,   # (Cmid/nj, 1) f32
    wd_ref,   # (Cmid/nj, k*k) f32 (BN-folded)
    bd_ref,   # (Cmid/nj, 1) f32
    wp_ref,   # (Cmid/nj, Cout) bf16 (BN-folded, TRANSPOSED: chunking must
              # ride the sublane axis — Pallas requires lane-axis blocks
              # divisible by 128 or whole)
    bp_ref,   # (Cout, 1) f32
    out_ref,  # (1, Cout, Po)
    y_ref,    # VMEM scratch (Cout, Po) f32 — partial-projection accumulator
    *,
    taps: tuple,
    ho: int,
    wo: int,
    h: int,
    w: int,
    stride: int,
    planes: int,
    residual: bool,
    has_expand: bool,
    nj: int,
):
    po = ho * wo
    compute_dtype = wp_ref.dtype  # bf16 in serving; f32 in oracle tests

    # Expand (1x1 conv, MXU) per phase plane; ReLU6 epilogue. With nj > 1
    # only a Cmid-chunk of the expanded tensor is ever live in VMEM; the
    # projection below accumulates chunk partials into the scratch (the
    # depthwise is per-channel, so chunks are independent; the project is a
    # sum over Cmid, so partial matmuls add exactly).
    hs = []
    for p in range(planes):
        xp = x_ref[0, :, p, :]  # (Cin, Po)
        if has_expand:
            acc = jax.lax.dot_general(
                we_ref[...], xp,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            hp = jnp.clip(acc + be_ref[...], 0.0, 6.0)
        else:
            hp = xp.astype(jnp.float32)
        hs.append(hp.astype(compute_dtype))

    # Depthwise tap sum on the OUTPUT grid (VPU).
    yo_idx = jax.lax.broadcasted_iota(jnp.int32, (1, po), 1) // wo
    xo_idx = jax.lax.broadcasted_iota(jnp.int32, (1, po), 1) % wo
    acc = jnp.broadcast_to(bd_ref[...], (bd_ref.shape[0], po))
    for t in taps:
        hp = hs[t.plane]
        # term[q] = hp[q + shift]: a left-roll via static slice + concat
        # (Mosaic's tpu.dynamic_rotate only supports 32-bit data, so
        # pltpu.roll is off the table for bf16); wraparound only reaches
        # masked (invalid) positions.
        s = t.shift % po
        term = jnp.concatenate([hp[:, s:], hp[:, :s]], axis=1) if s else hp
        term = term.astype(jnp.float32)
        if t.needs_mask:
            iy = stride * yo_idx + t.dy
            ix = stride * xo_idx + t.dx
            valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
            term = jnp.where(valid, term, 0.0)
        acc = acc + wd_ref[:, t.tap][:, None] * term
    h2 = jnp.clip(acc, 0.0, 6.0).astype(compute_dtype)

    # Partial projection (1x1 conv, MXU) for this chunk: wp_t.T @ h2.
    y = jax.lax.dot_general(
        wp_ref[...], h2,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if nj == 1:
        y = y + bp_ref[...]
        if residual:
            y = y + x_ref[0, :, 0, :].astype(jnp.float32)
        out_ref[0] = y.astype(out_ref.dtype)
        return

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        y_ref[...] = y

    @pl.when(j > 0)
    def _accum():
        y_ref[...] = y_ref[...] + y

    @pl.when(j == nj - 1)
    def _emit():
        out = y_ref[...] + bp_ref[...]
        if residual:
            out = out + x_ref[0, :, 0, :].astype(jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)


@dataclass(frozen=True)
class FusedBlockParams:
    """BN-folded weights + geometry for one fused MBConv block."""

    we: jnp.ndarray | None  # (Cmid, Cin) bf16
    be: jnp.ndarray | None  # (Cmid, 1) f32
    wd: jnp.ndarray  # (Cmid, k*k) f32
    bd: jnp.ndarray  # (Cmid, 1) f32
    wp: jnp.ndarray  # (Cout, Cmid) bf16
    bp: jnp.ndarray  # (Cout, 1) f32
    h: int
    w: int
    kernel: int
    stride: int
    residual: bool

    @property
    def has_expand(self) -> bool:
        return self.we is not None


def to_phase_planes(x_cp: jnp.ndarray, h: int, w: int, stride: int) -> jnp.ndarray:
    """(B, C, H*W) row-major -> (B, C, planes, Po) phase planes.

    stride 1 is a trivial expand-dims; stride 2 splits even/odd rows and
    columns (a pure column permutation, done in XLA on the small block
    input — 1x1 convs commute with it)."""
    b, c, p = x_cp.shape
    if stride == 1:
        return x_cp[:, :, None, :]
    x4 = x_cp.reshape(b, c, h // 2, 2, w // 2, 2)
    x4 = x4.transpose(0, 1, 3, 5, 2, 4)  # (B, C, py, px, Ho, Wo)
    return x4.reshape(b, c, 4, (h // 2) * (w // 2))


# VMEM working-set budget per grid step. v5e cores have 128 MB VMEM but
# Mosaic's scoped allocation is capped at 16 MB (and the raise-limit XLA
# flag is absent from this toolchain). The estimate below tracks the
# DATA-DEPENDENCE working set; Mosaic's scheduler keeps ~2x that live
# (measured: a block estimated at 10.4 MB allocated 22.2 MB — it hoists
# several tap-shift temporaries), so the budget bakes in that fudge.
_VMEM_BUDGET = 5 * 1024 * 1024


def _pick_num_chunks(cmid, cin, cout, planes, po, x_itemsize, c_itemsize,
                     o_itemsize) -> int:
    """Smallest Cmid-chunk count whose per-step working set fits the budget.

    Candidate counts must divide Cmid into sublane-aligned (multiple-of-8)
    chunks. Estimate = double-buffered input/output blocks + the chunk's
    expanded planes + the f32 depthwise tap/acc temporaries + the f32
    projection scratch."""
    def est(nj):
        c = cmid // nj
        fixed = 2 * cin * planes * po * x_itemsize + 2 * cout * po * o_itemsize
        if nj > 1:
            fixed += cout * po * 4  # scratch accumulator
        return fixed + planes * c * po * c_itemsize + 2 * c * po * 4

    if est(1) <= _VMEM_BUDGET:
        return 1
    valid = [nj for nj in range(2, cmid // 8 + 1)
             if cmid % nj == 0 and (cmid // nj) % 8 == 0]
    for nj in valid:
        if est(nj) <= _VMEM_BUDGET:
            return nj
    return valid[-1] if valid else 1


def fused_mbconv(
    x_cp: jnp.ndarray,  # (B, Cin, H*W) channel-major, row-major positions
    p: FusedBlockParams,
    interpret: bool = False,
    num_chunks: int | None = None,
) -> jnp.ndarray:  # (B, Cout, Ho*Wo)
    taps, ho, wo = enumerate_taps(p.kernel, p.stride, p.h, p.w)
    planes = 1 if p.stride == 1 else 4
    b, cin, _ = x_cp.shape
    cout = p.wp.shape[0]
    cmid = p.wd.shape[0]
    po = ho * wo

    x_planes = to_phase_planes(x_cp, p.h, p.w, p.stride)

    # Chunk Cmid when the whole expanded tensor would blow scoped VMEM.
    # No-expand blocks read their input per-channel, so chunking would also
    # have to slice x; they are small (turbo never fuses them) — keep whole.
    if num_chunks is not None:
        nj = num_chunks
    elif p.has_expand:
        nj = _pick_num_chunks(
            cmid, cin, cout, planes, po, x_planes.dtype.itemsize,
            p.wp.dtype.itemsize, x_cp.dtype.itemsize,
        )
    else:
        nj = 1
    cchunk = cmid // nj

    kernel = functools.partial(
        _mbconv_kernel,
        taps=tuple(taps),
        ho=ho, wo=wo, h=p.h, w=p.w,
        stride=p.stride, planes=planes,
        residual=p.residual, has_expand=p.has_expand, nj=nj,
    )
    weight_args = []
    weight_specs = []
    # wp travels transposed (Cmid, Cout): every Cmid-chunked operand blocks
    # over its ROW (sublane) axis, which Pallas allows at multiple-of-8.
    for arr, chunked in (
        (p.we, True), (p.be, True), (p.wd, True), (p.bd, True),
        (None if p.wp is None else p.wp.T, True), (p.bp, False),
    ):
        if arr is None:
            continue
        weight_args.append(arr)
        if chunked and nj > 1:
            block = (cchunk,) + arr.shape[1:]
            weight_specs.append(pl.BlockSpec(
                block, lambda i, j: (j, 0), memory_space=pltpu.VMEM))
        else:
            weight_specs.append(pl.BlockSpec(
                arr.shape, lambda i, j, nd=arr.ndim: (0,) * nd,
                memory_space=pltpu.VMEM))
    if not p.has_expand:
        # Kernel signature keeps we/be slots; feed 1x1 placeholders.
        weight_args = [jnp.zeros((cmid, cin), jnp.bfloat16),
                       jnp.zeros((cmid, 1), jnp.float32)] + weight_args
        weight_specs = [
            pl.BlockSpec((cmid, cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmid, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + weight_specs

    out = pl.pallas_call(
        kernel,
        grid=(b, nj),
        in_specs=[
            pl.BlockSpec((1, cin, planes, x_planes.shape[-1]),
                         lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((1, cout, po), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cout, po), x_cp.dtype),
        scratch_shapes=[pltpu.VMEM((cout, po), jnp.float32)],
        interpret=interpret,
    )(x_planes, *weight_args)
    return out


def fold_bn(kernel: np.ndarray, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-3):
    """Fold inference BatchNorm into conv weights: returns (w_scaled_factor,
    bias) where y = conv(x, kernel * factor) + bias equals BN(conv(x))."""
    factor = np.asarray(bn_scale) / np.sqrt(np.asarray(bn_var) + eps)
    bias = np.asarray(bn_bias) - np.asarray(bn_mean) * factor
    return factor, bias
