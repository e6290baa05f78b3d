"""Device ops: fused preprocessing and detection postprocess.

- :mod:`vbt_tpu.ops.preprocess` — frame resize/normalize fused into the
  jitted graph (replaces odt.py:10-19's host-side tf.image.resize).
- :mod:`vbt_tpu.ops.postprocess` — XLA anchor-decode + class-aware NMS
  (behavioural reference, also the CPU path).
- :mod:`vbt_tpu.ops.nms_pallas` — the Pallas fused anchor-decode + NMS
  kernel (replaces the reference's ``TFLite_Detection_PostProcess`` C++
  custom op, SURVEY.md §2.3).
"""

from vbt_tpu.ops.postprocess import Detections, detection_postprocess
from vbt_tpu.ops.preprocess import preprocess_frames

__all__ = ["Detections", "detection_postprocess", "preprocess_frames"]
