"""EfficientDet-Lite model family as flax modules.

Replaces the reference's opaque ``.tflite`` binaries (consumed at
track.py:93 and eval.py:167 via the TFLite C++ interpreter) with a
TPU-native JAX implementation: EfficientNet-lite backbone, BiFPN feature
fusion, and box/class heads (SURVEY.md §2.4 "EfficientDet-Lite 0/1/2").
"""

from vbt_tpu.models.efficientdet import (
    MODEL_SPECS,
    EfficientDet,
    ModelSpec,
    get_model_spec,
)

__all__ = ["EfficientDet", "ModelSpec", "MODEL_SPECS", "get_model_spec"]
