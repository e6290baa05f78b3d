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


def test_mosaic_boxes_follow_pixels():
    """Mosaic lane: each surviving box still covers bright marker pixels."""
    from vbt_tpu.train.augment import augment_mosaic_and_normalize

    imgs, boxes, valid = _marker_batch(b=8, s=64)
    out_imgs, out_boxes, out_valid = augment_mosaic_and_normalize(
        imgs, jnp.asarray(boxes), jnp.asarray(valid), jax.random.PRNGKey(5),
        mosaic_p=1.0, jitter_p=0.0,
    )
    out_imgs = np.asarray(out_imgs) * STDDEV_RGB + MEAN_RGB
    out_boxes = np.asarray(out_boxes)
    out_valid = np.asarray(out_valid)
    assert out_boxes.shape == (8, 8, 4)  # 4x GT capacity
    checked = 0
    for i in range(8):
        for g in np.nonzero(out_valid[i])[0]:
            y0, x0, y1, x1 = out_boxes[i, g]
            ys = slice(int(np.floor(y0)), int(np.ceil(y1)))
            xs = slice(int(np.floor(x0)), int(np.ceil(x1)))
            region = out_imgs[i, ys, xs, 0]
            if region.size == 0:
                continue
            # The box region must be substantially brighter than background.
            assert region.max() > 100, (i, g, out_boxes[i, g])
            checked += 1
    assert checked >= 8  # mosaic produces plenty of surviving boxes


def test_mosaic_p_zero_keeps_plain_lane():
    """mosaic_p=0, jitter off, flip determined by key: output equals the
    plain path padded to 4x capacity."""
    from vbt_tpu.train.augment import augment_mosaic_and_normalize

    imgs, boxes, valid = _marker_batch(b=4, s=64)
    key = jax.random.PRNGKey(11)
    out_imgs, out_boxes, out_valid = augment_mosaic_and_normalize(
        imgs, jnp.asarray(boxes), jnp.asarray(valid), key,
        mosaic_p=0.0, jitter_p=0.0,
    )
    assert int(np.asarray(out_valid).sum()) == int(valid.sum())


def test_device_data_trainer_epoch_runs_and_learns():
    """Fused device-resident loop: one gather+augment+step program per
    batch; loss decreases over a few epochs on a tiny overfit set."""
    from vbt_tpu.models import ModelSpec
    from vbt_tpu.train.data import DetectionDataset
    from vbt_tpu.train.fused import DeviceDataTrainer
    from vbt_tpu.train.train_step import Trainer

    rng = np.random.default_rng(0)
    size = 128
    imgs, boxes, valid = [], [], []
    for _ in range(8):
        img = np.zeros((size, size, 3), np.uint8)
        y0, x0 = rng.integers(20, 70, 2)
        img[y0:y0+40, x0:x0+40] = 200
        b = np.zeros((4, 4), np.float32); v = np.zeros((4,), bool)
        b[0] = [y0, x0, y0+40, x0+40]; v[0] = True
        imgs.append(img); boxes.append(b); valid.append(v)
    ds = DetectionDataset(
        images=np.stack(imgs), boxes=np.stack(boxes),
        valid=np.stack(valid), names=[str(i) for i in range(8)],
    )
    spec = ModelSpec("tiny", "lite0", size, 32, 1, 1)
    trainer = Trainer(spec, base_lr=0.05, total_steps=8, warmup_steps=1,
                      input_size=size)
    state = trainer.init_state(seed=0)
    ddt = DeviceDataTrainer(trainer, ds, ds, mosaic_p=0.5)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(4):  # 8 steps total — matches the trainer's LR schedule
        state, metrics, key = ddt.epoch(state, rng, 4, key)
        losses.append(float(np.mean([float(m["loss"]) for m in metrics])))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert np.isfinite(ddt.val_loss(state))
