"""Device-resident training loop: the whole dataset lives in HBM.

The per-step host path (gather a 19.6 MB uint8 batch on host, ship it through
the dev tunnel, dispatch augment + train step separately) dominated epoch
time in round 1. Here the full train/valid sets are transferred to the device
once (~300 MB uint8 for the reference dataset) and each step is ONE compiled
program: index-gather -> mosaic/flip/scale-jitter augmentation -> target
assignment -> fwd/bwd/optimizer. Only (batch,) int32 index vectors and an RNG
key cross the host boundary per step; metrics are read back once per epoch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vbt_tpu.ops.preprocess import MEAN_RGB, STDDEV_RGB
from vbt_tpu.train.augment import augment_mosaic_and_normalize
from vbt_tpu.train.data import DetectionDataset
from vbt_tpu.train.train_step import Trainer, _eval_forward_impl, _train_step_impl


class DeviceDataTrainer:
    """Wraps a :class:`Trainer` with device-resident data and fused steps."""

    def __init__(
        self,
        trainer: Trainer,
        train_ds: DetectionDataset,
        valid_ds: DetectionDataset | None = None,
        mosaic_p: float = 0.5,
        jitter: tuple[float, float] = (0.5, 1.6),
    ):
        self.trainer = trainer
        self.mosaic_p = mosaic_p
        self.jitter = jitter
        self.n_train = len(train_ds)
        self._train_images = jax.device_put(train_ds.images)
        self._train_boxes = jax.device_put(train_ds.boxes)
        self._train_valid = jax.device_put(train_ds.valid)
        if valid_ds is not None and len(valid_ds):
            self._valid_images = jax.device_put(valid_ds.images)
            self._valid_boxes = jax.device_put(valid_ds.boxes)
            self._valid_valid = jax.device_put(valid_ds.valid)
        else:
            self._valid_images = None
        self._step = jax.jit(functools.partial(_fused_step_impl, self))
        self._val = jax.jit(functools.partial(_fused_val_impl, self))

    def epoch(self, state, rng: np.random.Generator, batch_size: int, key,
              max_batches: int | None = None, mosaic_p: float | None = None):
        """One shuffled epoch.

        Returns ``(state, device_metric_list, advanced_key)`` — callers must
        thread the returned key into the next epoch or augmentation
        randomness repeats. mosaic_p overrides the constructor value
        (traced — e.g. to switch mosaic off for the final epochs without
        recompiling)."""
        p = self.mosaic_p if mosaic_p is None else mosaic_p
        order = rng.permutation(self.n_train)
        stop = self.n_train - (self.n_train % batch_size)
        if max_batches is not None:
            stop = min(stop, max_batches * batch_size)
        metrics = []
        for i in range(0, stop, batch_size):
            idx = jnp.asarray(order[i : i + batch_size], jnp.int32)
            key, sub = jax.random.split(key)
            state, m = self._step(
                state, self._train_images, self._train_boxes,
                self._train_valid, idx, sub, jnp.float32(p),
            )
            metrics.append(m)
        return state, metrics, key

    def val_loss(self, state, batch_size: int = 32) -> float:
        """Mean validation loss, evaluated in bounded batches (a whole
        lite2-sized validation set in one program would OOM a 16 GB chip)."""
        if self._valid_images is None:
            return float("nan")
        n = int(self._valid_images.shape[0])
        losses, weights = [], []
        for i in range(0, n, batch_size):
            j = min(i + batch_size, n)
            m = self._val(
                state,
                self._valid_images[i:j],
                self._valid_boxes[i:j],
                self._valid_valid[i:j],
            )
            losses.append(m["loss"])
            weights.append(j - i)
        losses = np.asarray([float(v) for v in losses])
        weights = np.asarray(weights, float)
        return float((losses * weights).sum() / weights.sum())


def _fused_step_impl(dt: DeviceDataTrainer, state, images_all, boxes_all,
                     valid_all, idx, key, mosaic_p):
    imgs = images_all[idx]
    boxes = boxes_all[idx]
    valid = valid_all[idx]
    images, gt_boxes, gt_valid = augment_mosaic_and_normalize(
        imgs, boxes, valid, key,
        lo=dt.jitter[0], hi=dt.jitter[1], mosaic_p=mosaic_p,
    )
    batch = {"images": images, "gt_boxes": gt_boxes, "gt_valid": gt_valid}
    return _train_step_impl(dt.trainer, state, batch)


def _fused_val_impl(dt: DeviceDataTrainer, state, images_all, boxes_all,
                    valid_all):
    from vbt_tpu.train.losses import detection_loss
    from vbt_tpu.train.targets import assign_targets

    images = (images_all.astype(jnp.float32) - MEAN_RGB) / STDDEV_RGB
    box_t, cls_t, pos, ign = jax.vmap(
        lambda b, v: assign_targets(
            dt.trainer.anchors, b, v, num_classes=dt.trainer.spec.num_classes
        )
    )(boxes_all, valid_all)
    deltas, logits = _eval_forward_impl(dt.trainer, state, images)
    _, metrics = detection_loss(deltas, logits, box_t, cls_t, pos, ign)
    return metrics
