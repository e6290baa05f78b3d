"""EfficientNet-lite backbone (flax linen).

The "lite" family is EfficientNet with mobile/quantization-friendly edits:
no squeeze-excite, ReLU6 instead of swish, and fixed (unscaled) stem/head.
The reference consumes these backbones indirectly through tflite_model_maker
(train.py:23,29 ``model_spec.get('efficientdet_lite0')``); here they are
first-party flax modules emitting the C3/C4/C5 feature pyramid taps the
detection neck needs.

All convolutions are NHWC and BN uses (momentum=0.99, eps=1e-3), matching
the standard EfficientNet recipe. Compute dtype is configurable (bfloat16 on
TPU); parameters stay float32.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from vbt_tpu.models.quant import OFF, QuantConv


@dataclass(frozen=True)
class MBConvArgs:
    kernel: int
    stride: int
    expand: int
    out_ch: int
    repeats: int


# EfficientNet-B0 block table; lite variants scale channels/repeats from it.
_B0_BLOCKS: tuple[MBConvArgs, ...] = (
    MBConvArgs(kernel=3, stride=1, expand=1, out_ch=16, repeats=1),
    MBConvArgs(kernel=3, stride=2, expand=6, out_ch=24, repeats=2),
    MBConvArgs(kernel=5, stride=2, expand=6, out_ch=40, repeats=2),
    MBConvArgs(kernel=3, stride=2, expand=6, out_ch=80, repeats=3),
    MBConvArgs(kernel=5, stride=1, expand=6, out_ch=112, repeats=3),
    MBConvArgs(kernel=5, stride=2, expand=6, out_ch=192, repeats=4),
    MBConvArgs(kernel=3, stride=1, expand=6, out_ch=320, repeats=1),
)

#: (width_multiplier, depth_multiplier) per lite variant.
LITE_SCALING = {
    "lite0": (1.0, 1.0),
    "lite1": (1.0, 1.1),
    "lite2": (1.1, 1.2),
    "lite3": (1.2, 1.4),
    "lite4": (1.4, 1.8),
}

STEM_CHANNELS = 32  # fixed in the lite family (not width-scaled)


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    """Standard EfficientNet channel rounding to a multiple of ``divisor``."""
    scaled = filters * width
    new = max(divisor, int(scaled + divisor / 2) // divisor * divisor)
    if new < 0.9 * scaled:  # never drop below 90%
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def scaled_blocks(variant: str) -> list[MBConvArgs]:
    """Block table for a lite variant.

    Lite family quirk: the first and last block groups keep their repeat
    count (only channels scale), preserving the fixed stem/head contract.
    """
    width, depth = LITE_SCALING[variant]
    out = []
    last = len(_B0_BLOCKS) - 1
    for i, b in enumerate(_B0_BLOCKS):
        reps = b.repeats if i in (0, last) else round_repeats(b.repeats, depth)
        out.append(
            MBConvArgs(
                kernel=b.kernel,
                stride=b.stride,
                expand=b.expand,
                out_ch=round_filters(b.out_ch, width),
                repeats=reps,
            )
        )
    return out


class BatchNormAct(nn.Module):
    """BatchNorm + optional ReLU6, EfficientNet hyperparameters."""

    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
        )(x)
        if self.act:
            x = nn.relu6(x)
        return x


class EfficientNetLite(nn.Module):
    """Backbone returning the stride-8/16/32 feature taps (C3, C4, C5)."""

    variant: str = "lite0"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, quant: str = OFF) -> dict[int, jnp.ndarray]:
        x = QuantConv(
            STEM_CHANNELS,
            (3, 3),
            strides=(2, 2),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            name="stem",
        )(x, quant=quant)
        x = BatchNormAct(dtype=self.dtype, name="stem_bn")(x, train)

        blocks = scaled_blocks(self.variant)
        features: dict[int, jnp.ndarray] = {}
        # Feature pyramid levels: stride 8 -> level 3 (after group index 2),
        # stride 16 -> level 4 (after group 4), stride 32 -> level 5 (last).
        taps = {2: 3, 4: 4, 6: 5}

        for gi, group in enumerate(blocks):
            for ri in range(group.repeats):
                stride = group.stride if ri == 0 else 1
                x = MBConvBlock(
                    args=group,
                    stride=stride,
                    dtype=self.dtype,
                    name=f"g{gi}_b{ri}",
                )(x, train, quant)
            if gi in taps:
                features[taps[gi]] = x
        return features


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck, lite flavour (no SE, ReLU6)."""

    args: MBConvArgs
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, quant: str = OFF):
        inputs = x
        in_ch = x.shape[-1]
        mid = in_ch * self.args.expand

        if self.args.expand != 1:
            x = QuantConv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="expand")(x, quant=quant)
            x = BatchNormAct(dtype=self.dtype, name="expand_bn")(x, train)

        k = self.args.kernel
        x = QuantConv(
            mid,
            (k, k),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=mid,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(x, quant=quant)
        x = BatchNormAct(dtype=self.dtype, name="depthwise_bn")(x, train)

        x = QuantConv(self.args.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="project")(x, quant=quant)
        x = BatchNormAct(act=False, dtype=self.dtype, name="project_bn")(x, train)

        if self.stride == 1 and in_ch == self.args.out_ch:
            x = x + inputs
        return x
