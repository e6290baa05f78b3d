"""Frame preprocessing fused into the detection graph.

The reference preprocesses on host through TensorFlow: uint8 frame ->
``tf.image.resize`` (bilinear, half-pixel centers) -> cast back to uint8 ->
quantized model input (odt.py:10-19; note there is NO normalization — the
int8 model dequantizes internally). Here the resize, the dequantization, and
the normalization all run inside the jitted XLA graph on device, so frames
cross the host boundary exactly once per batch as raw uint8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# tflite_model_maker's EfficientDet-Lite input normalization.
MEAN_RGB = 127.0
STDDEV_RGB = 128.0


def preprocess_frames(
    frames: jnp.ndarray,
    input_size: int,
    dtype=jnp.float32,
    quantize_uint8: bool = False,
) -> jnp.ndarray:
    """Resize a uint8 frame batch (B, H, W, 3) to the model input.

    Bilinear resize with half-pixel centers (matching tf.image.resize v2,
    odt.py:16), optional uint8 round-trip to mimic the reference's
    quantized input path bit-for-bit, then (x - 127) / 128 normalization.
    """
    b = frames.shape[0]
    x = frames.astype(jnp.float32)
    # Identity resize is a static no-op: bilinear with half-pixel centers at
    # equal size reproduces the input exactly, and skipping it statically
    # spares XLA a gather/matmul pass over the full frame batch.
    if frames.shape[1:3] != (input_size, input_size):
        # antialias=False matches tf.image.resize's default kernel exactly.
        x = jax.image.resize(
            x, (b, input_size, input_size, 3), method="bilinear", antialias=False
        )
    if quantize_uint8:
        # tf.cast(float, uint8) truncates toward zero; values are >= 0 here.
        x = jnp.clip(jnp.floor(x), 0.0, 255.0)
    return ((x - MEAN_RGB) / STDDEV_RGB).astype(dtype)
