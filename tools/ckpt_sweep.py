"""Evaluate COCO AP for every saved training checkpoint of a run.

From-scratch schedules can peak before the final epoch (validation loss
bottoms early while AP keeps moving); this sweep makes checkpoint
selection evidence-based instead of exporting the last state blindly.

Usage: python -m tools.ckpt_sweep ARCH CKPT_DIR [--data_dir D]
(evaluates BOTH raw and EMA parameters at every checkpoint)
"""

import click


@click.command()
@click.argument("architecture")
@click.argument("ckpt_dir")
@click.option("--data_dir", default="/root/reference/data")
def main(architecture, ckpt_dir, data_dir):
    from vbt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import glob
    import os
    import re

    from vbt_tpu.models import get_model_spec
    from vbt_tpu.runtime.checkpoint import load_train_checkpoint
    from vbt_tpu.runtime.pipeline import DetectionPipeline
    from vbt_tpu.train.evaluate import evaluate_model
    from vbt_tpu.train.train_step import Trainer

    spec = get_model_spec(architecture)
    trainer = Trainer(spec, base_lr=0.01, total_steps=10, warmup_steps=1)
    template = trainer.init_state(seed=0)

    steps = sorted(
        int(re.search(r"step_(\d+)", p).group(1))
        for p in glob.glob(os.path.join(ckpt_dir, "step_*.msgpack"))
    )
    test_dir = os.path.join(data_dir, "test")
    for step in steps:
        state = load_train_checkpoint(ckpt_dir, step, template)
        for tag, use_ema in (("raw", False), ("ema", True)):
            pipe = DetectionPipeline(
                spec=spec, variables=trainer.variables(state, use_ema=use_ema)
            )
            m = evaluate_model(pipe, test_dir)
            print(
                f"epoch {step:5d} {tag}: AP {m['AP']:.4f} "
                f"AP50 {m['AP50']:.4f} AP75 {m['AP75']:.4f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
