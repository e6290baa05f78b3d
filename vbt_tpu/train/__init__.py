"""Training: JAX fine-tuning path for the EfficientDet-Lite family.

Replaces the reference's tflite_model_maker training flow (train.py:26-70:
PASCAL-VOC loaders, 50-epoch fine-tune, COCO-style eval, export) with a
TPU-native pipeline: jitted train step sharded over a device mesh, RetinaNet
focal/Huber detection losses, and a single-class COCO-style AP evaluator.
"""
