"""Greedy checkpoint soup: average top checkpoints of one training run.

Checkpoints late in a long from-scratch schedule oscillate around a basin
(tools/ckpt_sweep.py output); averaging their weights ("model soups",
Wortsman et al. 2022) often beats every individual checkpoint. Greedy
recipe: rank candidates by their swept metric, seed the soup with the best,
then admit each next candidate only if the evaluated soup metric does not
drop. BN batch_stats average alongside params (same trajectory, so the
running stats are directly compatible).

Usage:
  python -m tools.ckpt_soup ARCH CKPT_DIR --sweep_log /tmp/sweep.txt \
      --top_k 8 --out /tmp/soup.msgpack

The reference has no counterpart (its train.py:67 exports only the final
state); this is part of the evidence-based checkpoint selection subsystem.
"""

import re

import click


def parse_sweep(path):
    """Yield (step, tag, metrics) entries from a ckpt_sweep log."""
    pat = re.compile(
        r"epoch\s+(\d+)\s+(raw|ema): AP (\d\.\d+) AP50 (\d\.\d+) AP75 (\d\.\d+)"
    )
    out = []
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                out.append(
                    (int(m.group(1)), m.group(2),
                     {"AP": float(m.group(3)), "AP50": float(m.group(4)),
                      "AP75": float(m.group(5))})
                )
    return out


@click.command()
@click.argument("architecture")
@click.argument("ckpt_dir")
@click.option("--sweep_log", required=True,
              help="tools/ckpt_sweep.py output ranking the candidates")
@click.option("--top_k", default=8, help="candidates to consider, best-first")
@click.option("--metric", default="AP", type=click.Choice(["AP", "AP50", "AP75"]))
@click.option("--min_step", default=0, help="ignore earlier checkpoints")
@click.option("--data_dir", default="/root/reference/data")
@click.option("--out", default=None, help="msgpack path for the final soup")
@click.option("--seed_msgpack", default=None,
              help="Seed the greedy soup from this params msgpack (e.g. a "
              "previously shipped soup) instead of the best swept candidate. "
              "Only valid when the candidates descend from the seed (same "
              "basin), e.g. a low-LR fine-tune warm-started from it.")
def main(architecture, ckpt_dir, sweep_log, top_k, metric, min_step, data_dir,
         out, seed_msgpack):
    from vbt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import os

    import jax
    import numpy as np

    from vbt_tpu.models import get_model_spec
    from vbt_tpu.runtime.checkpoint import (load_params, load_train_checkpoint,
                                            save_params)
    from vbt_tpu.runtime.pipeline import DetectionPipeline
    from vbt_tpu.train.evaluate import evaluate_model
    from vbt_tpu.train.train_step import Trainer

    spec = get_model_spec(architecture)
    trainer = Trainer(spec, base_lr=0.01, total_steps=10, warmup_steps=1)
    template = trainer.init_state(seed=0)
    test_dir = os.path.join(data_dir, "test")

    cands = [c for c in parse_sweep(sweep_log) if c[0] >= min_step]
    cands.sort(key=lambda c: c[2][metric], reverse=True)
    cands = cands[:top_k]
    if not cands:
        raise click.ClickException("no candidates parsed from sweep log")

    def variables_of(step, tag):
        state = load_train_checkpoint(ckpt_dir, step, template)
        return trainer.variables(state, use_ema=tag == "ema")

    def fp32(tree):
        return jax.tree.map(lambda a: np.asarray(a, np.float64), tree)

    def evaluate(variables):
        pipe = DetectionPipeline(spec=spec, variables=jax.tree.map(
            lambda a: np.asarray(a, np.float32), variables))
        return evaluate_model(pipe, test_dir)

    if seed_msgpack:
        soup_sum = fp32(load_params(seed_msgpack, trainer.variables(template)))
        members = [(os.path.basename(seed_msgpack), "seed")]
        best = evaluate(soup_sum)
        print(f"seed {seed_msgpack}: {metric} {best[metric]:.4f}", flush=True)
        rest = cands
    else:
        step, tag, swept = cands[0]
        soup_sum = fp32(variables_of(step, tag))
        members = [(step, tag)]
        best = evaluate(soup_sum)
        print(f"seed {step}/{tag}: {metric} {best[metric]:.4f} "
              f"(swept {swept[metric]:.4f})", flush=True)
        rest = cands[1:]

    for step, tag, swept in rest:
        trial_sum = jax.tree.map(
            lambda s, v: s + v, soup_sum, fp32(variables_of(step, tag)))
        n = len(members) + 1
        trial = jax.tree.map(lambda s: s / n, trial_sum)
        m = evaluate(trial)
        verdict = "KEEP" if m[metric] >= best[metric] else "drop"
        print(f"+ {step}/{tag} (swept {swept[metric]:.4f}) -> soup "
              f"AP {m['AP']:.4f} AP50 {m['AP50']:.4f} AP75 {m['AP75']:.4f} "
              f"[{verdict}]", flush=True)
        if m[metric] >= best[metric]:
            soup_sum = trial_sum
            members.append((step, tag))
            best = m

    n = len(members)
    soup = jax.tree.map(lambda s: np.asarray(s / n, np.float32), soup_sum)
    print(f"final soup ({n} members: {members}): AP {best['AP']:.4f} "
          f"AP50 {best['AP50']:.4f} AP75 {best['AP75']:.4f}", flush=True)
    if out:
        save_params(out, soup)
        print(f"saved {out}", flush=True)


if __name__ == "__main__":
    main()
