"""Box / class prediction heads (flax linen).

RetinaNet-style heads shared across pyramid levels: ``repeats`` separable
convs (conv weights shared across levels, BatchNorm per level, as in
EfficientDet) followed by a final separable conv projecting to
``num_anchors * 4`` box deltas or ``num_anchors * num_classes`` logits.
The class head's final bias is initialized to -log((1-p)/p), p=0.01, the
standard focal-loss prior.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from vbt_tpu.models.quant import OFF, QuantConv


class _SharedSepConv(nn.Module):
    """Separable conv with weights shared across levels (no BN inside)."""

    channels: int
    dtype: Any = jnp.float32
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, quant: str = OFF):
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
        return QuantConv(
            self.channels,
            (1, 1),
            use_bias=True,
            bias_init=self.bias_init,
            dtype=self.dtype,
            name="pointwise",
        )(x, quant=quant)


class PredictionHead(nn.Module):
    """Head applied to every pyramid level; returns per-level maps."""

    out_per_anchor: int  # 4 for boxes, num_classes for scores
    num_anchors: int
    channels: int
    repeats: int
    dtype: Any = jnp.float32
    final_bias_prior: float | None = None  # class prior p, or None

    @nn.compact
    def __call__(self, feats: dict[int, jnp.ndarray], train: bool = False,
                 quant: str = OFF):
        levels = sorted(feats)
        convs = [
            _SharedSepConv(self.channels, dtype=self.dtype, name=f"conv{i}")
            for i in range(self.repeats)
        ]
        if self.final_bias_prior is not None:
            prior = self.final_bias_prior
            bias_init = nn.initializers.constant(-math.log((1 - prior) / prior))
        else:
            bias_init = nn.initializers.zeros
        final = _SharedSepConv(
            self.out_per_anchor * self.num_anchors,
            dtype=self.dtype,
            bias_init=bias_init,
            name="final",
        )

        outputs = {}
        for lv in levels:
            x = feats[lv]
            for i, conv in enumerate(convs):
                x = conv(x, quant)
                # Per-level BatchNorm (weights not shared across levels).
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.99,
                    epsilon=1e-3,
                    dtype=self.dtype,
                    name=f"bn{i}_p{lv}",
                )(x)
                x = nn.relu6(x)
            outputs[lv] = final(x, quant)
        return outputs
