"""Device-side training augmentation (jitted).

The host-side per-image cv2 augmentation cost ~0.8 s per 64-image batch —
300x the train step itself — so augmentation runs on device instead: raw
uint8 batches cross the host boundary once, then per-image horizontal flip
and scale-jitter (via ``jax.image.scale_and_translate`` with traced scales,
which lowers to dense resampling matmuls on the MXU) and normalization all
happen in one compiled program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vbt_tpu.ops.preprocess import MEAN_RGB, STDDEV_RGB


@functools.partial(jax.jit, static_argnames=("lo", "hi"))
def augment_and_normalize(
    images_uint8: jnp.ndarray,  # (B, S, S, 3) uint8
    boxes: jnp.ndarray,  # (B, G, 4) [ymin,xmin,ymax,xmax] in px
    valid: jnp.ndarray,  # (B, G) bool
    key: jnp.ndarray,
    lo: float = 0.6,
    hi: float = 1.4,
):
    """Random flip + scale jitter + normalize, all on device.

    Returns (images f32 normalized, boxes, valid).
    """
    b, s, _, _ = images_uint8.shape
    kf, kj, ks, kty, ktx = jax.random.split(key, 5)

    images = images_uint8.astype(jnp.float32)

    # Per-image horizontal flip (p = 0.5).
    flip = jax.random.bernoulli(kf, 0.5, (b,))
    flipped_imgs = images[:, :, ::-1, :]
    images = jnp.where(flip[:, None, None, None], flipped_imgs, images)
    fb = jnp.stack(
        [boxes[..., 0], s - boxes[..., 3], boxes[..., 2], s - boxes[..., 1]],
        axis=-1,
    )
    boxes = jnp.where(flip[:, None, None], fb, boxes)

    # Per-image scale jitter + random crop/pad (p = 0.5).
    do_jit = jax.random.bernoulli(kj, 0.5, (b,))
    scale = jnp.where(do_jit, jax.random.uniform(ks, (b,), minval=lo, maxval=hi), 1.0)
    span = s - scale * s  # positive when shrinking (pad), negative when zooming
    ty = jax.random.uniform(kty, (b,)) * span
    tx = jax.random.uniform(ktx, (b,)) * span

    def resample(img, sc, t_y, t_x):
        return jax.image.scale_and_translate(
            img,
            (s, s, 3),
            (0, 1),
            jnp.stack([sc, sc]),
            jnp.stack([t_y, t_x]),
            method="linear",
        )

    images = jax.vmap(resample)(images, scale, ty, tx)

    shift = jnp.stack([ty, tx, ty, tx], axis=-1)[:, None, :]
    boxes = boxes * scale[:, None, None] + shift
    boxes = jnp.clip(boxes, 0.0, s)
    valid = (
        valid
        & ((boxes[..., 2] - boxes[..., 0]) > 2.0)
        & ((boxes[..., 3] - boxes[..., 1]) > 2.0)
    )

    images = (images - MEAN_RGB) / STDDEV_RGB
    return images, boxes.astype(jnp.float32), valid
