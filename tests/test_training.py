"""Training stack: losses, target assignment, overfit smoke, COCO AP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbt_tpu.models import get_model_spec
from vbt_tpu.models.anchors import AnchorConfig, decode_boxes, generate_anchors
from vbt_tpu.train.coco_eval import coco_metrics
from vbt_tpu.train.losses import detection_loss, focal_loss
from vbt_tpu.train.targets import assign_targets
from vbt_tpu.train.train_step import Trainer


def test_focal_loss_basics():
    # Confident correct predictions ~0 loss; confident wrong ones large.
    good = focal_loss(jnp.asarray([8.0]), jnp.asarray([1.0]))
    bad = focal_loss(jnp.asarray([-8.0]), jnp.asarray([1.0]))
    assert float(good[0]) < 1e-3
    assert float(bad[0]) > 1.0


def test_assign_targets_positive_on_gt():
    cfg = AnchorConfig(input_size=128)
    anchors = jnp.asarray(generate_anchors(cfg))
    gt = jnp.asarray([[40.0, 40.0, 80.0, 80.0]])
    valid = jnp.asarray([True])
    box_t, cls_t, pos, ign = assign_targets(anchors, gt, valid)
    assert bool(pos.any())  # at least the forced best anchor
    assert not bool((pos & ign).any())
    # Decoding the targets of positive anchors recovers the GT box.
    idx = int(jnp.argmax(pos))
    rec = decode_boxes(box_t[idx], anchors[idx])
    np.testing.assert_allclose(np.asarray(rec), [40, 40, 80, 80], atol=1e-3)
    # Class target set only on positives.
    np.testing.assert_array_equal(
        np.asarray(cls_t[:, 0] > 0), np.asarray(pos)
    )


def test_assign_targets_empty_gt():
    cfg = AnchorConfig(input_size=128)
    anchors = jnp.asarray(generate_anchors(cfg))
    gt = jnp.zeros((2, 4))
    valid = jnp.asarray([False, False])
    _, cls_t, pos, ign = assign_targets(anchors, gt, valid)
    assert not bool(pos.any())
    assert not bool(ign.any())
    assert float(cls_t.sum()) == 0.0


def test_detection_loss_perfect_prediction_is_small():
    cfg = AnchorConfig(input_size=128)
    anchors = jnp.asarray(generate_anchors(cfg))
    gt = jnp.asarray([[[30.0, 30.0, 90.0, 90.0]]])
    valid = jnp.asarray([[True]])
    box_t, cls_t, pos, ign = jax.vmap(
        lambda b, v: assign_targets(anchors, b, v)
    )(gt, valid)
    logits = jnp.where(cls_t > 0, 9.0, -9.0)
    total, metrics = detection_loss(box_t, logits, box_t, cls_t, pos, ign)
    assert float(metrics["box_loss"]) < 1e-9
    assert float(total) < 1e-2


@pytest.mark.slow  # ~8 min of x64-CPU training; run with `-m slow`
def test_trainer_overfits_single_image():
    """A few steps on one tiny image must reduce the loss substantially."""
    spec = get_model_spec("efficientdet_lite0")
    trainer = Trainer(spec, base_lr=0.05, total_steps=60, warmup_steps=1, input_size=128)
    state = trainer.init_state(seed=0)

    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, size=(1, 128, 128, 3)).astype(np.float32)
    batch = {
        "images": jnp.asarray(img),
        "gt_boxes": jnp.asarray([[[30.0, 30.0, 90.0, 90.0]]]),
        "gt_valid": jnp.asarray([[True]]),
    }
    state, first = trainer.train_step(state, batch)
    losses = [float(first["loss"])]
    for _ in range(49):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert int(state.step) == 50


def test_coco_metrics_perfect_and_miss():
    gt = [np.array([[10.0, 10.0, 50.0, 50.0]])]
    perfect = [{"boxes": np.array([[10.0, 10.0, 50.0, 50.0]]),
                "scores": np.array([0.9])}]
    m = coco_metrics(perfect, gt)
    assert m["AP"] == pytest.approx(1.0, abs=1e-6)
    assert m["AP50"] == pytest.approx(1.0, abs=1e-6)

    miss = [{"boxes": np.array([[100.0, 100.0, 120.0, 120.0]]),
             "scores": np.array([0.9])}]
    m2 = coco_metrics(miss, gt)
    assert m2["AP"] == 0.0


def test_coco_metrics_half_overlap():
    gt = [np.array([[0.0, 0.0, 100.0, 100.0]])]
    # IoU = 0.5 exactly: counts at threshold 0.5 but not 0.75.
    det = [{"boxes": np.array([[0.0, 0.0, 100.0, 50.0]]),
            "scores": np.array([0.9])}]
    m = coco_metrics(det, gt)
    assert m["AP50"] == pytest.approx(1.0, abs=1e-6)
    assert m["AP75"] == 0.0
