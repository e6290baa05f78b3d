"""EfficientDet-Lite detector assembly and the model-spec registry.

Mirrors the capability surface of ``tflite_model_maker``'s
``model_spec.get('efficientdet_liteX')`` (reference train.py:23,29) with
first-party flax modules. The forward pass emits flattened box deltas and
class logits aligned with :mod:`vbt_tpu.models.anchors`; decoding/NMS lives
in :mod:`vbt_tpu.ops` so the postprocess can run fused on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from vbt_tpu.models.anchors import ANCHORS_PER_CELL, AnchorConfig
from vbt_tpu.models.bifpn import BiFPN
from vbt_tpu.models.efficientnet_lite import EfficientNetLite
from vbt_tpu.models.heads import PredictionHead


@dataclass(frozen=True)
class ModelSpec:
    name: str
    backbone: str
    input_size: int
    fpn_channels: int
    fpn_repeats: int
    head_repeats: int
    anchor_scale: float = 3.0
    num_classes: int = 1  # the reference detects one class: 'barbell'

    @property
    def anchor_config(self) -> AnchorConfig:
        return AnchorConfig(input_size=self.input_size, anchor_scale=self.anchor_scale)


MODEL_SPECS = {
    "efficientdet_lite0": ModelSpec("efficientdet_lite0", "lite0", 320, 64, 3, 3),
    "efficientdet_lite1": ModelSpec("efficientdet_lite1", "lite1", 384, 88, 4, 3),
    "efficientdet_lite2": ModelSpec("efficientdet_lite2", "lite2", 448, 112, 5, 3),
}
# The reference's "whole" variants share the architecture with their base
# (only the fine-tuning regime differed: train_whole_model=True,
# train.py:54); register aliases so model names round-trip through the CLIs.
for _base in list(MODEL_SPECS.values()):
    MODEL_SPECS[f"{_base.name}_whole"] = _base


def get_model_spec(name: str) -> ModelSpec:
    key = name if name in MODEL_SPECS else f"efficientdet_{name}"
    if key not in MODEL_SPECS:
        raise KeyError(f"unknown model spec '{name}'; have {sorted(MODEL_SPECS)}")
    return MODEL_SPECS[key]


class EfficientDet(nn.Module):
    """Backbone + BiFPN + heads; returns flattened (deltas, logits).

    Output shapes: boxes (B, N, 4) as (ty, tx, th, tw) deltas and logits
    (B, N, num_classes), where N enumerates anchors level-major, row-major,
    per-cell anchor fastest — exactly the order produced by
    :func:`vbt_tpu.models.anchors.generate_anchors`.
    """

    spec: ModelSpec
    dtype: Any = jnp.float32

    def setup(self):
        # Attribute names define the param-tree keys — identical to the
        # original inline-compact layout ('backbone', 'fpn', 'box_net',
        # 'class_net'), so existing checkpoints load unchanged.
        self.backbone = EfficientNetLite(self.spec.backbone, dtype=self.dtype)
        self.fpn = BiFPN(
            self.spec.fpn_channels,
            self.spec.fpn_repeats,
            weight_method="sum",
            dtype=self.dtype,
        )
        self.box_net = PredictionHead(
            out_per_anchor=4,
            num_anchors=ANCHORS_PER_CELL,
            channels=self.spec.fpn_channels,
            repeats=self.spec.head_repeats,
            dtype=self.dtype,
        )
        self.class_net = PredictionHead(
            out_per_anchor=self.spec.num_classes,
            num_anchors=ANCHORS_PER_CELL,
            channels=self.spec.fpn_channels,
            repeats=self.spec.head_repeats,
            dtype=self.dtype,
            final_bias_prior=0.01,
        )

    def __call__(self, images: jnp.ndarray, train: bool = False, quant: str = "off",
                 frozen: tuple = ()):
        feats = self.backbone(images, train and "backbone" not in frozen, quant)
        return self.neck_and_heads(feats, train, quant, frozen=frozen)

    def neck_and_heads(self, feats: dict[int, jnp.ndarray], train: bool = False,
                       quant: str = "off", frozen: tuple = ()):
        """BiFPN + prediction heads on precomputed backbone feature taps.

        Public method target for ``model.apply(..., method='neck_and_heads')``
        — the turbo backbone (models/turbo.py) computes the taps with fused
        Pallas MBConv kernels and re-enters the flax graph here.

        ``frozen`` (heads-only training, cli/train.py): subtrees named in it
        run in inference mode even when ``train=True`` — their BatchNorm
        normalizes with the donor's running statistics, so the heads fit
        features identical to what the frozen extractor produces at serving.
        """
        feats = self.fpn(feats, train and "fpn" not in frozen, quant)
        box_maps = self.box_net(feats, train, quant)
        cls_maps = self.class_net(feats, train, quant)

        def flatten(maps: dict[int, jnp.ndarray], per_anchor: int) -> jnp.ndarray:
            parts = []
            for lv in sorted(maps):
                m = maps[lv]
                b, h, w, _ = m.shape
                parts.append(m.reshape(b, h * w * ANCHORS_PER_CELL, per_anchor))
            return jnp.concatenate(parts, axis=1)

        return flatten(box_maps, 4), flatten(cls_maps, self.spec.num_classes)
