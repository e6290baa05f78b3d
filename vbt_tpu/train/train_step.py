"""Sharded detection train step.

One jitted step: data-parallel over the ('data',) mesh axis via sharding
annotations (GSPMD inserts the gradient all-reduce over ICI — no explicit
collectives, SURVEY.md §2.2). Optimizer follows the automl EfficientDet
recipe the reference trains with (train.py:49-56): SGD momentum 0.9, cosine
schedule with linear warmup, weight decay excluding BN/bias, global-norm
gradient clipping.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from vbt_tpu.models import EfficientDet, ModelSpec
from vbt_tpu.models.anchors import generate_anchors
from vbt_tpu.train.losses import detection_loss
from vbt_tpu.train.targets import assign_targets


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any  # exponential moving average (model-maker uses 0.9998)


def make_optimizer(
    base_lr: float,
    total_steps: int,
    warmup_steps: int,
    weight_decay: float = 4e-5,
    freeze_top_keys: tuple = (),
):
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, 2),
        end_value=0.0,
    )

    def decay_mask(params):
        # No weight decay on biases and BatchNorm scale/bias, and none on
        # frozen subtrees (their updates must be exactly zero).
        def keep(path, _):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            top = path[0].key if hasattr(path[0], "key") else str(path[0])
            return name not in ("bias", "scale") and top not in freeze_top_keys

        return jax.tree_util.tree_map_with_path(keep, params)

    transforms = []
    if freeze_top_keys:
        # Heads-only mode (reference train.py:train_whole_model=False ->
        # Model Maker var_freeze_expr '(efficientnet|fpn_cells|resample_p6)'):
        # zero the frozen top-level subtrees' gradients BEFORE global-norm
        # clipping, so frozen-extractor gradients cannot inflate the norm
        # and shrink the head updates that actually train (the reference's
        # var_freeze_expr excludes frozen vars from the optimizer entirely).
        # With zero incoming grads and decay_mask excluding the frozen
        # keys, SGD momentum stays identically zero for them.
        def freeze_mask(params):
            return {
                k: jax.tree.map(lambda _: k in freeze_top_keys, sub)
                for k, sub in params.items()
            }

        transforms.append(optax.masked(optax.set_to_zero(), freeze_mask))
    transforms += [
        optax.clip_by_global_norm(10.0),
        optax.add_decayed_weights(weight_decay, mask=decay_mask),
        optax.sgd(schedule, momentum=0.9, nesterov=False),
    ]
    return optax.chain(*transforms), schedule


class Trainer:
    """Owns the model, anchors, optimizer, and the jitted step functions."""

    def __init__(
        self,
        spec: ModelSpec,
        base_lr: float = 0.08,
        total_steps: int = 1000,
        warmup_steps: int = 100,
        dtype=jnp.float32,
        mesh=None,
        input_size: int | None = None,
        ema_decay: float = 0.9998,
        freeze_top_keys: tuple = (),
    ):
        self.ema_decay = ema_decay
        self.freeze_top_keys = tuple(freeze_top_keys)
        self.spec = spec
        self.input_size = input_size or spec.input_size
        self.model = EfficientDet(spec, dtype=dtype)
        cfg = spec.anchor_config
        if self.input_size != cfg.input_size:
            from dataclasses import replace

            cfg = replace(cfg, input_size=self.input_size)
        self.anchors = jnp.asarray(generate_anchors(cfg))
        self.tx, self.schedule = make_optimizer(
            base_lr, total_steps, warmup_steps,
            freeze_top_keys=self.freeze_top_keys,
        )
        self.mesh = mesh
        self._step = jax.jit(functools.partial(_train_step_impl, self))
        self._eval_forward = jax.jit(functools.partial(_eval_forward_impl, self))
        self._eval_loss = jax.jit(functools.partial(_eval_loss_impl, self))

    def init_state(self, seed: int = 0, input_size: int | None = None) -> TrainState:
        size = input_size or self.input_size
        x = jnp.zeros((1, size, size, 3), jnp.float32)
        variables = jax.jit(functools.partial(self.model.init, train=True))(
            jax.random.PRNGKey(seed), x
        )
        params = variables["params"]
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(params),
            ema_params=params,
        )

    def train_step(self, state: TrainState, batch: dict):
        """batch: images (B,H,W,3) float, gt_boxes (B,G,4) pixels,
        gt_valid (B,G) bool."""
        return self._step(state, batch)

    def eval_forward(self, state: TrainState, images):
        return self._eval_forward(state, images)

    def eval_loss(self, state: TrainState, batch):
        """Validation loss (no parameter/batch-stat updates)."""
        return self._eval_loss(state, batch)

    def variables(self, state: TrainState, use_ema: bool = False):
        params = state.ema_params if use_ema else state.params
        return {"params": params, "batch_stats": state.batch_stats}


def _train_step_impl(trainer: Trainer, state: TrainState, batch):
    images = batch["images"]
    gt_boxes = batch["gt_boxes"]
    gt_valid = batch["gt_valid"]

    box_t, cls_t, pos, ign = jax.vmap(
        lambda b, v: assign_targets(
            trainer.anchors, b, v, num_classes=trainer.spec.num_classes
        )
    )(gt_boxes, gt_valid)

    def loss_fn(params):
        (deltas, logits), updates = trainer.model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            images,
            train=True,
            frozen=trainer.freeze_top_keys,
            mutable=["batch_stats"],
        )
        total, metrics = detection_loss(deltas, logits, box_t, cls_t, pos, ign)
        return total, (metrics, updates["batch_stats"])

    (_, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    if trainer.freeze_top_keys:
        # Frozen subtrees ran with use_running_average (frozen= above), so
        # their stats come through unchanged already; restoring them here
        # keeps the invariant explicit and guards against future BN modes.
        new_stats = {
            k: (state.batch_stats[k] if k in trainer.freeze_top_keys else v)
            for k, v in new_stats.items()
        }
    updates, new_opt = trainer.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    # Parameter EMA with warmup-aware decay (min(decay, (1+t)/(10+t)) is the
    # standard TF-EMA ramp so early steps do not anchor to the random init).
    t = state.step.astype(jnp.float32)
    decay = jnp.minimum(trainer.ema_decay, (1.0 + t) / (10.0 + t))
    new_ema = jax.tree.map(
        lambda e, p: e * decay + p * (1.0 - decay), state.ema_params, new_params
    )
    metrics = dict(metrics, lr=trainer.schedule(state.step))
    return (
        TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            ema_params=new_ema,
        ),
        metrics,
    )


def _eval_forward_impl(trainer: Trainer, state: TrainState, images):
    return trainer.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        images,
        train=False,
    )


def _eval_loss_impl(trainer: Trainer, state: TrainState, batch):
    box_t, cls_t, pos, ign = jax.vmap(
        lambda b, v: assign_targets(
            trainer.anchors, b, v, num_classes=trainer.spec.num_classes
        )
    )(batch["gt_boxes"], batch["gt_valid"])
    deltas, logits = _eval_forward_impl(trainer, state, batch["images"])
    _, metrics = detection_loss(deltas, logits, box_t, cls_t, pos, ign)
    return metrics
