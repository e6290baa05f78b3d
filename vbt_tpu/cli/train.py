"""Train EfficientDet-Lite barbell detectors.

Capability-compatible with the reference train.py (train.py:17-70): same
dataset layout (``data/{train,valid,test}`` PASCAL-VOC), same architecture
names and export naming (``{arch}[_whole]``), epoch/batch defaults, COCO
eval before/after export, and a ``models/{name}.log`` with per-epoch
``val_loss`` lines that training_plot.py can parse (training_plot.py:20).

Differences by design: no pretrained ImageNet backbone is available in this
environment, so ``--train_whole_model`` trains everything from scratch, and
``--heads_only`` freezes our own from-scratch ``{arch}_whole`` backbone+BiFPN
as the donor feature extractor (reference freezes the COCO-pretrained one via
Model Maker's var_freeze_expr); checkpoints export as flax msgpack instead of
.tflite.
"""

from __future__ import annotations

import os
import time

import click
import jax
import numpy as np

from vbt_tpu.models import get_model_spec
from vbt_tpu.runtime.checkpoint import save_params
from vbt_tpu.runtime.pipeline import DetectionPipeline
from vbt_tpu.train.data import load_voc_dataset
from vbt_tpu.train.evaluate import evaluate_model
from vbt_tpu.train.train_step import Trainer


def train_model(
    architecture: str,
    data_dir: str,
    export_dir: str,
    epochs: int,
    batch_size: int,
    train_whole_model: bool,
    base_lr: float | None = None,
    seed: int = 0,
    max_steps: int | None = None,
    log_fn=print,
    input_size: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    mosaic_p: float = 0.5,
    init_from: str | None = None,
):
    spec = get_model_spec(architecture)
    size = input_size or spec.input_size

    train_ds = load_voc_dataset(os.path.join(data_dir, "train"), size)
    valid_ds = load_voc_dataset(os.path.join(data_dir, "valid"), size)

    steps_per_epoch = max(len(train_ds) // batch_size, 1)
    total_steps = steps_per_epoch * epochs
    if max_steps is not None:
        total_steps = min(total_steps, max_steps)
    lr = base_lr if base_lr is not None else 0.08 * batch_size / 64.0

    # Heads-only mode (reference train.py:24 train_whole_model=False, i.e.
    # Model Maker's var_freeze_expr '(efficientnet|fpn_cells|resample_p6)'):
    # the feature extractor (backbone + BiFPN) is frozen and only the
    # class/box heads train. The reference freezes a COCO-pretrained
    # backbone; no pretrained weights exist offline, so the donor here is
    # our own from-scratch `{architecture}_whole.msgpack` — the same
    # "frozen general extractor + cheap task heads" artifact contract.
    freeze = () if train_whole_model else ("backbone", "fpn")

    # Resolve the donor BEFORE paying model init: a missing donor should
    # fail fast, not after the full parameter tree initializes.
    donor_path = None
    if freeze:
        donor_name = f"{architecture}_whole.msgpack"
        repo_models = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "models")
        candidates = [os.path.join(d, donor_name)
                      for d in (export_dir, repo_models)]
        donor_path = next((p for p in candidates if os.path.isfile(p)), None)
        if donor_path is None:
            raise FileNotFoundError(
                f"--heads_only needs a trained donor backbone: none of "
                f"{candidates} exists. Train the _whole variant first."
            )

    trainer = Trainer(
        spec,
        base_lr=lr,
        total_steps=total_steps,
        warmup_steps=max(total_steps // 20, 1),
        input_size=size,
        freeze_top_keys=freeze,
    )
    state = trainer.init_state(seed=seed)

    if freeze:
        from vbt_tpu.runtime.checkpoint import load_params

        donor = load_params(
            donor_path,
            {"params": state.params, "batch_stats": state.batch_stats},
        )
        params = {k: (donor["params"][k] if k in freeze else v)
                  for k, v in state.params.items()}
        stats = {k: (donor["batch_stats"][k] if k in freeze else v)
                 for k, v in state.batch_stats.items()}
        state = state._replace(
            params=params, batch_stats=stats, ema_params=params,
            opt_state=trainer.tx.init(params),
        )
        log_fn(f"Heads-only: froze backbone+fpn from {donor_path}")

    if init_from:
        # Warm start: seed the whole parameter set (params + batch stats)
        # from an exported .msgpack (e.g. a checkpoint soup) and train on —
        # fresh optimizer/schedule, unlike --resume which restores the full
        # TrainState mid-schedule.
        from vbt_tpu.runtime.checkpoint import load_params

        donor = load_params(
            init_from,
            {"params": state.params, "batch_stats": state.batch_stats},
        )
        state = state._replace(
            params=donor["params"], batch_stats=donor["batch_stats"],
            ema_params=donor["params"],
            opt_state=trainer.tx.init(donor["params"]),
        )
        log_fn(f"Warm start from {init_from}")

    from vbt_tpu.runtime.checkpoint import (
        latest_train_checkpoint,
        load_train_checkpoint,
        save_train_checkpoint,
    )

    start_epoch = 0
    if resume and checkpoint_dir is not None:
        latest = latest_train_checkpoint(checkpoint_dir)
        if latest is not None:
            state = load_train_checkpoint(checkpoint_dir, latest, state)
            start_epoch = latest
            log_fn(f"Resumed from checkpoint at epoch {latest}")

    from vbt_tpu.train.fused import DeviceDataTrainer

    ddt = DeviceDataTrainer(trainer, train_ds, valid_ds, mosaic_p=mosaic_p)

    rng = np.random.default_rng(seed + start_epoch)
    aug_key = jax.random.PRNGKey(seed + start_epoch)
    step = start_epoch * steps_per_epoch
    val_losses = []
    mosaic_cutoff = int(epochs * 0.9)  # mosaic off for the final 10%
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        remaining = None if max_steps is None else max(max_steps - step, 0)
        state, train_metrics, aug_key = ddt.epoch(
            state, rng, batch_size, aug_key, max_batches=remaining,
            mosaic_p=mosaic_p if epoch < mosaic_cutoff else 0.0,
        )
        step += len(train_metrics)

        val_loss = ddt.val_loss(state)
        val_losses.append(val_loss)
        train_loss = (
            float(np.mean([float(m["loss"]) for m in train_metrics]))
            if train_metrics
            else float("nan")
        )
        log_fn(
            f"Epoch {epoch + 1}/{epochs} - {time.time() - t0:.0f}s - "
            f"loss: {train_loss:.4f} - val_loss: {val_loss:.4f}"
        )
        if (
            checkpoint_dir is not None
            and checkpoint_every
            and (epoch + 1) % checkpoint_every == 0
        ):
            save_train_checkpoint(checkpoint_dir, epoch + 1, state)
        if max_steps is not None and step >= max_steps:
            break

    return trainer, state, val_losses


@click.command()
@click.option("--data_dir", default="data", show_default=True,
              help="Dataset root containing train/valid/test VOC directories.")
@click.option("--export_dir", default="models", show_default=True)
@click.option("--architecture", default="efficientdet_lite0", show_default=True,
              type=click.Choice(["efficientdet_lite0", "efficientdet_lite1", "efficientdet_lite2"]))
@click.option("--epochs", default=50, show_default=True, type=int)
@click.option("--batch_size", default=4, show_default=True, type=int)
@click.option("--train_whole_model/--heads_only", default=True, show_default=True)
@click.option("--lr", default=None, type=float,
              help="Peak learning rate; default scales 0.08 * batch/64.")
@click.option("--seed", default=0, type=int, show_default=True)
@click.option("--max_steps", default=None, type=int,
              help="Hard step cap (smoke tests).")
@click.option("--checkpoint_dir", default=None,
              help="Directory for mid-training checkpoints.")
@click.option("--checkpoint_every", default=0, type=int, show_default=True,
              help="Checkpoint every N epochs (0 = off).")
@click.option("--resume", is_flag=True, help="Resume from the latest checkpoint.")
@click.option("--mosaic_p", default=0.5, type=float, show_default=True,
              help="Per-image probability of 4-image mosaic augmentation.")
@click.option("--init_from", default=None,
              help="Warm-start params/batch_stats from an exported .msgpack "
                   "(fresh optimizer; unlike --resume).")
def main(data_dir, export_dir, architecture, epochs, batch_size,
         train_whole_model, lr, seed, max_steps, checkpoint_dir,
         checkpoint_every, resume, mosaic_p, init_from):
    """Train a barbell detector and export it with COCO-style evaluation."""
    from vbt_tpu.utils.cache import enable_persistent_cache
    from vbt_tpu.utils.health import require_healthy_tpu

    enable_persistent_cache()
    require_healthy_tpu(context="train")  # fail fast on a wedged tunnel
    os.makedirs(export_dir, exist_ok=True)
    name = f"{architecture}_whole" if train_whole_model else architecture
    log_path = os.path.join(export_dir, f"{name}.log")

    log_lines = []

    def log_fn(msg):
        print(msg)
        log_lines.append(msg)

    trainer, state, _ = train_model(
        architecture, data_dir, export_dir, epochs, batch_size,
        train_whole_model, base_lr=lr, seed=seed, max_steps=max_steps,
        log_fn=log_fn, checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every, resume=resume, mosaic_p=mosaic_p,
        init_from=init_from,
    )

    print("Evaluating the exported model...")
    results = {}
    for tag, use_ema in [("raw", False), ("ema", True)]:
        pipeline = DetectionPipeline(
            spec=trainer.spec, variables=trainer.variables(state, use_ema=use_ema)
        )
        results[tag] = evaluate_model(pipeline, os.path.join(data_dir, "test"))
        log_fn(f"{tag}: {results[tag]}")

    # Export whichever parameter set evaluates better (EMA usually wins).
    best = max(results, key=lambda t: results[t]["AP"])
    ckpt_path = os.path.join(export_dir, f"{name}.msgpack")
    save_params(ckpt_path, trainer.variables(state, use_ema=best == "ema"))
    log_fn(f"Exported {ckpt_path} ({best} params, AP={results[best]['AP']:.4f})")

    with open(log_path, "w") as f:
        f.write("\n".join(log_lines) + "\n")


if __name__ == "__main__":
    main()
