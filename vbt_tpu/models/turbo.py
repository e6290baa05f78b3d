"""Turbo backbone: the EfficientNet-lite forward with fused MBConv kernels.

Serving-only fast path (inference, float/bf16). High-resolution MBConv
blocks run through the fully-fused Pallas kernel
(:mod:`vbt_tpu.ops.fused_mbconv` — expand/depthwise/project without HBM
round trips for the 6x-expanded intermediate); the small late-stage blocks
stay on plain XLA convs where fusion buys nothing. Consumes the SAME
variables pytree as the flax model (models/efficientnet_lite.py is the
numerical oracle; equality pinned in tests/test_fused_mbconv.py), so any
shipped checkpoint works unchanged.

Layout: activations travel channel-major (B, C, H*W) between fused blocks
and convert to NHWC only at the fused/XLA boundary and at the C3/C4/C5
feature taps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from vbt_tpu.models.efficientnet_lite import scaled_blocks
from vbt_tpu.ops.fused_mbconv import FusedBlockParams, fused_mbconv

BN_EPS = 1e-3
# Fuse blocks whose INPUT spatial area is at least this many positions;
# below it the expanded intermediate is small enough that XLA's HBM round
# trips stop mattering (and tiny lane counts waste the kernel's tiles).
FUSE_MIN_SPATIAL = 1600  # 40x40


def _bn_factors(bn_params, bn_stats, dtype):
    # jnp (not numpy): the fold runs under jit, where params are tracers.
    scale = jnp.asarray(bn_params["BatchNorm_0"]["scale"], jnp.float32)
    bias = jnp.asarray(bn_params["BatchNorm_0"]["bias"], jnp.float32)
    mean = jnp.asarray(bn_stats["BatchNorm_0"]["mean"], jnp.float32)
    var = jnp.asarray(bn_stats["BatchNorm_0"]["var"], jnp.float32)
    factor = scale / jnp.sqrt(var + BN_EPS)
    shift = bias - mean * factor
    return factor.astype(dtype), shift.astype(dtype)


def fold_block_params(
    block_params, block_stats, h: int, w: int, kernel: int, stride: int,
    residual: bool, compute_dtype=jnp.bfloat16,
) -> FusedBlockParams:
    """BN-fold one MBConv block's variables into kernel-ready arrays."""
    def bn(name):
        return _bn_factors(block_params[name], block_stats[name], jnp.float32)

    we = be = None
    if "expand" in block_params:
        k = jnp.asarray(block_params["expand"]["kernel"], jnp.float32)[0, 0]
        f, b = bn("expand_bn")
        we = (k * f).T.astype(compute_dtype)  # (Cmid, Cin)
        be = b[:, None]

    kd = jnp.asarray(block_params["depthwise"]["kernel"], jnp.float32)  # (k,k,1,Cmid)
    f, b = bn("depthwise_bn")
    wd = (kd[:, :, 0, :] * f).reshape(kernel * kernel, -1).T  # (Cmid, k*k)
    bd = b[:, None]

    kp = jnp.asarray(block_params["project"]["kernel"], jnp.float32)[0, 0]
    f, b = bn("project_bn")
    wp = (kp * f).T.astype(compute_dtype)  # (Cout, Cmid)
    bp = b[:, None]

    return FusedBlockParams(
        we=we, be=be, wd=wd, bd=bd, wp=wp, bp=bp,
        h=h, w=w, kernel=kernel, stride=stride, residual=residual,
    )


def _nhwc_to_cp(x):
    b, h, w, c = x.shape
    return x.transpose(0, 3, 1, 2).reshape(b, c, h * w)


def _cp_to_nhwc(x, h, w):
    b, c, _ = x.shape
    return x.reshape(b, c, h, w).transpose(0, 2, 3, 1)


def _xla_block(x_nhwc, block_params, block_stats, args, stride, dtype):
    """Eval-mode MBConv on plain XLA convs (same math as the flax module)."""
    inputs = x_nhwc
    in_ch = x_nhwc.shape[-1]

    def conv(x, kernel, strides, groups):
        return lax.conv_general_dilated(
            x, jnp.asarray(kernel, dtype), window_strides=(strides, strides),
            padding="SAME", feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def bn_act(x, name, act=True):
        f, s = _bn_factors(block_params[name], block_stats[name], dtype)
        x = x * f + s
        return jax.nn.relu6(x) if act else x

    x = x_nhwc
    if "expand" in block_params:
        x = bn_act(conv(x, block_params["expand"]["kernel"], 1, 1), "expand_bn")
    mid = x.shape[-1]
    x = bn_act(conv(x, block_params["depthwise"]["kernel"], stride, mid), "depthwise_bn")
    x = bn_act(conv(x, block_params["project"]["kernel"], 1, 1), "project_bn", act=False)
    if stride == 1 and in_ch == args.out_ch:
        x = x + inputs
    return x


def turbo_backbone(
    variables, images: jnp.ndarray, variant: str,
    dtype=jnp.bfloat16, interpret: bool = False,
    fuse_min_spatial: int = FUSE_MIN_SPATIAL,
) -> dict[int, jnp.ndarray]:
    """EfficientNet-lite forward with fused high-res blocks.

    Same contract as ``EfficientNetLite.__call__`` in eval mode: NHWC
    image batch in, {3: C3, 4: C4, 5: C5} feature taps out.
    """
    params = variables["params"]["backbone"]
    stats = variables["batch_stats"]["backbone"]

    # Stem (XLA): 3->32 conv s2 + BN + relu6.
    x = lax.conv_general_dilated(
        images.astype(dtype),
        jnp.asarray(params["stem"]["kernel"], dtype),
        window_strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    f, s = _bn_factors(params["stem_bn"], stats["stem_bn"], dtype)
    x = jax.nn.relu6(x * f + s)
    h = w = x.shape[1]

    blocks = scaled_blocks(variant)
    taps = {2: 3, 4: 4, 6: 5}
    features: dict[int, jnp.ndarray] = {}
    layout = "nhwc"  # current layout of x

    for gi, group in enumerate(blocks):
        for ri in range(group.repeats):
            stride = group.stride if ri == 0 else 1
            name = f"g{gi}_b{ri}"
            in_ch = x.shape[1] if layout == "cp" else x.shape[-1]
            residual = stride == 1 and in_ch == group.out_ch
            # Only expand>1 blocks fuse: the no-expand stage-0 block keeps
            # its full-channel input at stem resolution live through every
            # depthwise tap temp and blows the 16 MB scoped-VMEM budget
            # (measured on v5e); it also has no 6x intermediate to save.
            if h * w >= fuse_min_spatial and group.expand != 1:
                if layout == "nhwc":
                    x = _nhwc_to_cp(x)
                    layout = "cp"
                fp = fold_block_params(
                    params[name], stats[name], h, w, group.kernel, stride,
                    residual, compute_dtype=dtype,
                )
                x = fused_mbconv(x.astype(dtype), fp, interpret=interpret)
            else:
                if layout == "cp":
                    x = _cp_to_nhwc(x, h, w)
                    layout = "nhwc"
                x = _xla_block(x, params[name], stats[name], group, stride, dtype)
            if stride == 2:
                h, w = -(-h // 2), -(-w // 2)
        if gi in taps:
            features[taps[gi]] = x if layout == "nhwc" else _cp_to_nhwc(x, h, w)

    return features


def turbo_forward(model, variables, images, interpret: bool = False):
    """Full detector forward with the turbo backbone: returns the same
    (deltas, logits) as ``model.apply(variables, images, train=False)``."""
    feats = turbo_backbone(
        variables, images, model.spec.backbone, dtype=model.dtype,
        interpret=interpret,
    )
    return model.apply(variables, feats, train=False, method="neck_and_heads")
