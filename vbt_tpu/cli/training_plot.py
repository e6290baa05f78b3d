"""Plot validation-loss curves for all trained models.

Behaviour-compatible with the reference training_plot.py
(training_plot.py:17-47): greps ``val_loss: <float>`` lines from
``models/*.log`` and renders one seaborn line per model into
``figs/training_plot.pdf``.
"""

from __future__ import annotations

import glob
import os
import re
from collections import defaultdict

import click
import pandas as pd

VAL_LOSS_RE = re.compile(r"val_loss: (\d+\.\d+)")


def parse_logs(log_dir: str) -> dict[str, list[float]]:
    losses: dict[str, list[float]] = defaultdict(list)
    for file in glob.glob(os.path.join(log_dir, "*.log")):
        with open(file) as f:
            for line in f:
                match = VAL_LOSS_RE.findall(line)
                if match:
                    losses[os.path.basename(file).split(".")[0]].append(
                        float(match[0])
                    )
    return losses


@click.command()
@click.option("--log_dir", default="models", show_default=True)
@click.option("--fig_dir", default="figs", show_default=True)
def main(log_dir, fig_dir):
    """Render figs/training_plot.pdf from models/*.log val_loss curves."""
    import matplotlib.pyplot as plt
    import seaborn as sns

    sns.set_theme(context="paper", style="ticks")
    losses = parse_logs(log_dir)
    if not losses:
        print(f"No val_loss lines found in {log_dir}/*.log; nothing to plot.")
        return

    # Long format built per model so logs of different lengths coexist
    # (e.g. a 1500-epoch run beside 1000-epoch ones; the reference's logs
    # were all 50 epochs so it could assume rectangular data).
    df = pd.concat(
        [
            pd.DataFrame(
                {
                    "epoch": range(1, len(vals) + 1),
                    "Model": name,
                    "loss": vals,
                }
            )
            for name, vals in sorted(losses.items())
        ],
        ignore_index=True,
    )

    _, ax = plt.subplots(figsize=(7, 4))
    sns.lineplot(ax=ax, data=df, x="epoch", y="loss", hue="Model")
    ax.set(xlabel="Epoch", ylabel="Validation loss")
    plt.tight_layout()
    os.makedirs(fig_dir, exist_ok=True)
    plt.savefig(os.path.join(fig_dir, "training_plot.pdf"))


if __name__ == "__main__":
    main()
