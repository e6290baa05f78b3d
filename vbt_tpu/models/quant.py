"""Post-training int8 quantization (TPU-native).

The reference's deployed artifact is a post-training int8 .tflite
(train.py:67 ``model.export`` + evaluate_tflite); its int8 kernels live in
the TFLite/XNNPACK C++ runtime (SURVEY.md §2.3). Here the replacement is
native XLA: dense convolutions lower to s8 x s8 -> s32 on the v5e MXU
(2x the bf16 peak), with symmetric per-output-channel weight scales and
per-tensor activation scales collected by a calibration pass.

Scheme (standard PTQ, matching TFLite's conv quantization):
- weights: symmetric int8 per output channel, scale = maxabs/127;
- activations: symmetric int8 per tensor, scale recorded as the running
  max-abs over calibration batches (stored in a ``quant`` flax collection);
- accumulation in int32, dequantized to f32 with the product scale;
- depthwise convolutions stay in the floating dtype: on TPU they are
  VPU-bound (no MXU win) and are the quantization-fragile layers — TFLite
  quantizes them only because its CPU backend profits; XLA does not.

``QuantConv`` is parameter-compatible with ``nn.Conv`` (same param names,
shapes, and initializers), so existing float checkpoints load unchanged.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

# Quantization modes threaded through the model's __call__ chain.
OFF = "off"
CALIBRATE = "calibrate"
INT8 = "int8"


class QuantConv(nn.Module):
    """Drop-in for ``nn.Conv`` with an int8 inference path.

    In ``off`` mode the math is identical to ``nn.Conv`` (same lax conv,
    same dtype promotion). ``calibrate`` runs float math but records the
    input's max-abs into the mutable ``quant`` collection. ``int8``
    quantizes input (per-tensor, from calibration) and kernel (per output
    channel) and convolves in int8 with int32 accumulation. Grouped
    (depthwise) convolutions always use the float path.
    """

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: str = "SAME"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, quant: str = OFF):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, in_ch // self.feature_group_count, self.features),
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias
            else None
        )

        dense = self.feature_group_count == 1
        if quant == CALIBRATE and dense:
            scale = self.variable(
                "quant", "act_scale", lambda: jnp.zeros((), jnp.float32)
            )
            scale.value = jnp.maximum(
                scale.value, jnp.abs(x).max().astype(jnp.float32)
            )

        if quant == INT8 and dense:
            has = self.has_variable("quant", "act_scale")
            if not has:
                raise ValueError(
                    "int8 mode requires a calibrated 'quant' collection"
                )
            act_max = self.get_variable("quant", "act_scale")
            s_in = jnp.maximum(act_max, 1e-8) / 127.0
            # Per-output-channel symmetric weight scales.
            w = jnp.asarray(kernel, jnp.float32)
            w_max = jnp.abs(w).max(axis=(0, 1, 2), keepdims=True)
            s_w = jnp.maximum(w_max, 1e-12) / 127.0
            w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
            x_q = jnp.clip(
                jnp.round(jnp.asarray(x, jnp.float32) / s_in), -127, 127
            ).astype(jnp.int8)
            acc = lax.conv_general_dilated(
                x_q,
                w_q,
                window_strides=self.strides,
                padding=self.padding,
                feature_group_count=1,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            out = acc.astype(jnp.float32) * (s_in * s_w.reshape(1, 1, 1, -1))
            out = out.astype(self.dtype)
            if bias is not None:
                out = out + jnp.asarray(bias, self.dtype)
            return out

        # Float path (off / calibrate / grouped convs): identical to nn.Conv.
        x, kernel_c = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        out = lax.conv_general_dilated(
            x,
            kernel_c,
            window_strides=self.strides,
            padding=self.padding,
            feature_group_count=self.feature_group_count,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            out = out + jnp.asarray(bias, self.dtype)
        return out


def calibrate(model, variables, batches) -> Any:
    """Run calibration batches through the model; returns variables with a
    populated ``quant`` collection (activation max-abs per dense conv).

    Each batch runs as ONE jitted program (eager per-op dispatch on TPU
    backends is minutes-slow); successive batches take the running max.
    """

    @jax.jit
    def one_batch(variables, images):
        return model.apply(
            variables, images, train=False, quant=CALIBRATE, mutable=["quant"]
        )[1]["quant"]

    base = {k: v for k, v in variables.items() if k != "quant"}
    quant_vars = None
    for images in batches:
        v = {**base, "quant": quant_vars} if quant_vars is not None else base
        quant_vars = one_batch(v, images)
    return {**base, "quant": quant_vars}
