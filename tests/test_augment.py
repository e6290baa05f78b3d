"""Device-side augmentation: geometry consistency between images and boxes."""

import jax
import jax.numpy as jnp
import numpy as np

from vbt_tpu.ops.preprocess import MEAN_RGB, STDDEV_RGB
from vbt_tpu.train.augment import augment_and_normalize


def _marker_batch(b=8, s=64):
    """Images with one bright square whose box is the ground truth."""
    rng = np.random.default_rng(0)
    imgs = np.zeros((b, s, s, 3), np.uint8)
    boxes = np.zeros((b, 2, 4), np.float32)
    valid = np.zeros((b, 2), bool)
    for i in range(b):
        y0, x0 = rng.integers(8, s - 24, size=2)
        imgs[i, y0 : y0 + 16, x0 : x0 + 16] = 255
        boxes[i, 0] = [y0, x0, y0 + 16, x0 + 16]
        valid[i, 0] = True
    return imgs, boxes, valid


def test_boxes_follow_pixels():
    imgs, boxes, valid = _marker_batch()
    out_imgs, out_boxes, out_valid = augment_and_normalize(
        imgs, jnp.asarray(boxes), jnp.asarray(valid), jax.random.PRNGKey(3)
    )
    out_imgs = np.asarray(out_imgs) * STDDEV_RGB + MEAN_RGB  # un-normalize
    out_boxes = np.asarray(out_boxes)
    out_valid = np.asarray(out_valid)
    for i in range(imgs.shape[0]):
        if not out_valid[i, 0]:
            continue
        mask = out_imgs[i, :, :, 0] > 128
        ys, xs = np.nonzero(mask)
        if len(ys) < 16:  # square mostly cropped out
            continue
        got = out_boxes[i, 0]
        # The transformed box must cover the bright pixels (within a couple
        # of pixels of bilinear blur).
        assert abs(ys.min() - got[0]) < 3.0
        assert abs(xs.min() - got[1]) < 3.0
        assert abs(ys.max() + 1 - got[2]) < 3.0
        assert abs(xs.max() + 1 - got[3]) < 3.0


def test_normalization_range():
    imgs, boxes, valid = _marker_batch()
    out_imgs, _, _ = augment_and_normalize(
        imgs, jnp.asarray(boxes), jnp.asarray(valid), jax.random.PRNGKey(0)
    )
    out = np.asarray(out_imgs)
    assert out.min() >= (0 - MEAN_RGB) / STDDEV_RGB - 1e-5
    assert out.max() <= (255 - MEAN_RGB) / STDDEV_RGB + 1e-5


def test_identity_when_not_augmented():
    # With flip and jitter probabilities both missing (p=0.5 each), some keys
    # produce the identity; verify the pure-normalization path is exact.
    imgs, boxes, valid = _marker_batch(b=4)
    for seed in range(10):
        key = jax.random.PRNGKey(seed)
        kf, kj, *_ = jax.random.split(key, 5)
        flip = np.asarray(jax.random.bernoulli(kf, 0.5, (4,)))
        jit_ = np.asarray(jax.random.bernoulli(kj, 0.5, (4,)))
        out_imgs, out_boxes, _ = augment_and_normalize(
            imgs, jnp.asarray(boxes), jnp.asarray(valid), key
        )
        for i in range(4):
            if flip[i] or jit_[i]:
                continue
            want = (imgs[i].astype(np.float32) - MEAN_RGB) / STDDEV_RGB
            np.testing.assert_allclose(np.asarray(out_imgs[i]), want, atol=1e-4)
            np.testing.assert_allclose(np.asarray(out_boxes[i]), boxes[i], atol=1e-5)
