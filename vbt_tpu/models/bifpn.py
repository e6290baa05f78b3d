"""BiFPN: bidirectional weighted feature pyramid (flax linen).

Fuses backbone taps C3/C4/C5 into pyramid levels P3..P7 with repeated
top-down + bottom-up passes. Structure follows the EfficientDet paper; the
lite variants use plain-sum fusion and ReLU6 (quantization-friendly), while
``weight_method='fastattn'`` enables the normalized fast-attention fusion.

Each fusion node applies: combine(inputs) -> ReLU6 -> separable conv -> BN.
Upsampling is nearest-neighbour; downsampling is 3x3/2 max-pool; channel
mismatches are fixed by 1x1 conv + BN before resampling.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from vbt_tpu.models.quant import OFF, QuantConv

MIN_LEVEL = 3
MAX_LEVEL = 7


def _upsample2x(x: jnp.ndarray, target_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour upsample to the target spatial size."""
    b, h, w, c = x.shape
    th, tw = target_hw
    # Integer-ratio nearest resize via repeat, robust for odd sizes: index map.
    rows = (jnp.arange(th) * h) // th
    cols = (jnp.arange(tw) * w) // tw
    return x[:, rows][:, :, cols]


def _downsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 max pool, SAME padding (the EfficientDet resample op)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")


class SepConvBN(nn.Module):
    """Depthwise separable conv + BN (no activation inside)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, quant: str = OFF):
        in_ch = x.shape[-1]
        x = QuantConv(
            in_ch,
            (3, 3),
            padding="SAME",
            feature_group_count=in_ch,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(x, quant=quant)
        x = QuantConv(self.channels, (1, 1), use_bias=True, dtype=self.dtype, name="pointwise")(x, quant=quant)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3, dtype=self.dtype
        )(x)
        return x


class ChannelResample(nn.Module):
    """1x1 conv + BN to the pyramid width (applied when channels differ)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, quant: str = OFF):
        if x.shape[-1] != self.channels:
            # name='Conv_0' keeps the auto-name nn.Conv produced, so float
            # checkpoints saved before QuantConv existed still load.
            x = QuantConv(
                self.channels, (1, 1), use_bias=True, dtype=self.dtype, name="Conv_0"
            )(x, quant=quant)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3, dtype=self.dtype
            )(x)
        return x


class FuseNode(nn.Module):
    """Weighted fusion of 2-3 same-shape inputs followed by conv refinement."""

    channels: int
    num_inputs: int
    weight_method: str = "sum"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: list[jnp.ndarray], train: bool, quant: str = OFF):
        assert len(inputs) == self.num_inputs
        if self.weight_method == "fastattn":
            w = self.param("fusion_weights", nn.initializers.ones, (self.num_inputs,))
            w = nn.relu(w).astype(inputs[0].dtype)
            denom = jnp.sum(w) + 1e-4
            x = sum(wi * t for wi, t in zip(w, inputs)) / denom
        else:  # 'sum' — the lite default
            x = sum(inputs)
        x = nn.relu6(x)
        return SepConvBN(self.channels, dtype=self.dtype, name="conv")(x, train, quant)


class BiFPNCell(nn.Module):
    """One top-down + bottom-up pass over levels MIN_LEVEL..MAX_LEVEL."""

    channels: int
    weight_method: str = "sum"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: dict[int, jnp.ndarray], train: bool, quant: str = OFF):
        levels = list(range(MIN_LEVEL, MAX_LEVEL + 1))

        # Top-down: P6' = node(P6, up(P7)), ..., P3' = node(P3, up(P4'))
        td: dict[int, jnp.ndarray] = {MAX_LEVEL: feats[MAX_LEVEL]}
        for lv in reversed(levels[:-1]):
            up = _upsample2x(td[lv + 1], feats[lv].shape[1:3])
            td[lv] = FuseNode(
                self.channels, 2, self.weight_method, self.dtype, name=f"td_p{lv}"
            )([feats[lv], up], train, quant)

        # Bottom-up: P4out = node(P4, P4', down(P3out)), ...,
        # P7out = node(P7, down(P6out)).
        out: dict[int, jnp.ndarray] = {MIN_LEVEL: td[MIN_LEVEL]}
        for lv in levels[1:]:
            down = _downsample2x(out[lv - 1])
            if lv == MAX_LEVEL:
                inputs = [feats[lv], down]
            else:
                inputs = [feats[lv], td[lv], down]
            out[lv] = FuseNode(
                self.channels, len(inputs), self.weight_method, self.dtype, name=f"bu_p{lv}"
            )(inputs, train, quant)
        return out


class BiFPN(nn.Module):
    """Full neck: lateral resampling, P6/P7 synthesis, ``repeats`` cells."""

    channels: int
    repeats: int
    weight_method: str = "sum"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, backbone_feats: dict[int, jnp.ndarray], train: bool = False,
                 quant: str = OFF):
        feats = {
            lv: ChannelResample(self.channels, dtype=self.dtype, name=f"lateral_p{lv}")(
                backbone_feats[lv], train, quant
            )
            for lv in (3, 4, 5)
        }
        # P6 from C5: channel resample happens above only for p3-p5; build P6/P7
        # from the original C5 via conv+BN then strided pooling.
        p6 = ChannelResample(self.channels, dtype=self.dtype, name="lateral_p6")(
            backbone_feats[5], train, quant
        )
        feats[6] = _downsample2x(p6)
        feats[7] = _downsample2x(feats[6])

        for r in range(self.repeats):
            feats = BiFPNCell(
                self.channels, self.weight_method, self.dtype, name=f"cell{r}"
            )(feats, train, quant)
        return feats
