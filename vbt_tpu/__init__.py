"""vbt-tpu: a TPU-native velocity-based-training (VBT) framework.

Re-implements the full capability surface of the reference CPU/TFLite
proof-of-concept (simonkosina/vbt) as an idiomatic JAX/XLA/Pallas stack:

- ``vbt_tpu.contract``  — the public data contract: pickled dataframe schema,
  filename grammar, and parsers for Kinovea / Qualisys / PASCAL-VOC inputs.
- ``vbt_tpu.analysis``  — phase segmentation, running averages and
  ROM/velocity metrics, both as an exact host reference and as a
  ``lax.scan``-compiled state machine.
- ``vbt_tpu.models``    — EfficientDet-Lite 0/1/2 (EfficientNet-lite backbone,
  BiFPN, box/class heads) as flax modules.
- ``vbt_tpu.ops``       — fused XLA preprocessing and Pallas kernels
  (anchor decode + class-aware NMS).
- ``vbt_tpu.tracking``  — SORT and OC-SORT multi-object trackers as
  fixed-capacity ``lax.scan`` programs.
- ``vbt_tpu.parallel``  — device meshes and sharding helpers.
- ``vbt_tpu.cli``       — the preserved public CLI surface
  (track / plot / eval / kinovea / qualisys / train).
"""

__version__ = "0.1.0"
