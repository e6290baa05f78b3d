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


def _mosaic_batch(images, boxes, valid, key):
    """4-image mosaic collage (device, branchless).

    Each output image is a 2x2 collage of itself plus 3 random partners
    from the same batch, split at a random center; partner boxes transform
    into their quadrant. The standard from-scratch detection lever (YOLOv4
    sec. 3.4) — the reference trains from COCO-pretrained weights instead
    (train.py:49-56), which are unavailable offline.

    images: (B,S,S,3) float32 (unnormalized), boxes: (B,G,4) px, valid (B,G).
    Returns (images, boxes (B,4G,4), valid (B,4G)).
    """
    b, s = images.shape[0], images.shape[1]
    kp, kc = jax.random.split(key)
    perms = jax.random.permutation(kp, b * 3).reshape(3, b) % b
    cy, cx = jnp.moveaxis(
        jax.random.uniform(kc, (b, 2), minval=0.3 * s, maxval=0.7 * s), -1, 0
    )

    yy = jnp.arange(s, dtype=jnp.float32)[:, None, None]
    xx = jnp.arange(s, dtype=jnp.float32)[None, :, None]

    def one(img4, box4, val4, c_y, c_x):
        # quadrant geometry: (scale_y, scale_x, offset_y, offset_x)
        quads = [
            (c_y / s, c_x / s, 0.0, 0.0),  # top-left
            (c_y / s, (s - c_x) / s, 0.0, c_x),  # top-right
            ((s - c_y) / s, c_x / s, c_y, 0.0),  # bottom-left
            ((s - c_y) / s, (s - c_x) / s, c_y, c_x),  # bottom-right
        ]
        out = jnp.zeros((s, s, 3), jnp.float32)
        out_boxes, out_valid = [], []
        for q, (sy, sx, ty, tx) in enumerate(quads):
            placed = jax.image.scale_and_translate(
                img4[q], (s, s, 3), (0, 1),
                jnp.stack([sy, sx]), jnp.stack([ty, tx]), method="linear",
            )
            in_y = (yy >= ty) & (yy < ty + sy * s)
            in_x = (xx >= tx) & (xx < tx + sx * s)
            out = out + jnp.where(in_y & in_x, placed, 0.0)
            scale_vec = jnp.stack([sy, sx, sy, sx])
            shift_vec = jnp.stack([ty, tx, ty, tx])
            bq = box4[q] * scale_vec + shift_vec
            out_boxes.append(bq)
            out_valid.append(val4[q])
        ob = jnp.concatenate(out_boxes, axis=0)
        ov = jnp.concatenate(out_valid, axis=0)
        ov = ov & ((ob[:, 2] - ob[:, 0]) > 2.0) & ((ob[:, 3] - ob[:, 1]) > 2.0)
        return out, ob, ov

    img4 = jnp.stack([images, images[perms[0]], images[perms[1]], images[perms[2]]], 1)
    box4 = jnp.stack([boxes, boxes[perms[0]], boxes[perms[1]], boxes[perms[2]]], 1)
    val4 = jnp.stack([valid, valid[perms[0]], valid[perms[1]], valid[perms[2]]], 1)
    return jax.vmap(one)(img4, box4, val4, cy, cx)


@functools.partial(jax.jit, static_argnames=("lo", "hi", "jitter_p"))
def augment_mosaic_and_normalize(
    images_uint8: jnp.ndarray,  # (B, S, S, 3) uint8
    boxes: jnp.ndarray,  # (B, G, 4) [ymin,xmin,ymax,xmax] in px
    valid: jnp.ndarray,  # (B, G) bool
    key: jnp.ndarray,
    lo: float = 0.5,
    hi: float = 1.6,
    mosaic_p=0.5,  # traced: schedules (e.g. mosaic-off final epochs) reuse the program
    jitter_p: float = 0.5,
):
    """Mosaic (p=mosaic_p) -> flip (p=0.5) -> scale jitter (p=jitter_p) ->
    normalize, all in one device program. GT capacity grows 4x (mosaic).

    Returns (images f32 normalized, boxes (B,4G,4), valid (B,4G)).
    """
    b, s, _, _ = images_uint8.shape
    g = boxes.shape[1]
    km, ksel, kf, kj, ks, kty, ktx = jax.random.split(key, 7)

    images = images_uint8.astype(jnp.float32)

    # Mosaic lane (computed for all, selected per image).
    m_img, m_box, m_val = _mosaic_batch(images, boxes, valid, km)
    # Plain lane padded to the mosaic GT capacity.
    p_box = jnp.pad(boxes, ((0, 0), (0, 3 * g), (0, 0)))
    p_val = jnp.pad(valid, ((0, 0), (0, 3 * g)))
    use_m = jax.random.bernoulli(ksel, mosaic_p, (b,))
    images = jnp.where(use_m[:, None, None, None], m_img, images)
    boxes = jnp.where(use_m[:, None, None], m_box, p_box)
    valid = jnp.where(use_m[:, None], m_val, p_val)

    # Per-image horizontal flip (p = 0.5).
    flip = jax.random.bernoulli(kf, 0.5, (b,))
    images = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)
    fb = jnp.stack(
        [boxes[..., 0], s - boxes[..., 3], boxes[..., 2], s - boxes[..., 1]],
        axis=-1,
    )
    boxes = jnp.where(flip[:, None, None], fb, boxes)

    # Per-image scale jitter + random crop/pad.
    do_jit = jax.random.bernoulli(kj, jitter_p, (b,))
    scale = jnp.where(do_jit, jax.random.uniform(ks, (b,), minval=lo, maxval=hi), 1.0)
    span = s - scale * s
    ty = jax.random.uniform(kty, (b,)) * span
    tx = jax.random.uniform(ktx, (b,)) * span

    def resample(img, sc, t_y, t_x):
        return jax.image.scale_and_translate(
            img, (s, s, 3), (0, 1),
            jnp.stack([sc, sc]), jnp.stack([t_y, t_x]), method="linear",
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
