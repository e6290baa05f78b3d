"""Runtime: the compiled detection/tracking pipeline and checkpointing."""

from vbt_tpu.runtime.pipeline import DetectionPipeline
from vbt_tpu.runtime.checkpoint import load_params, save_params

__all__ = ["DetectionPipeline", "load_params", "save_params"]
