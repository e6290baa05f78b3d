"""Regenerate the complete eval figure tree (reference figs/ parity).

The reference's figs/ holds, besides the combined PR/ROC curves:
18 per-model operating-point PDFs — precision_recall_<model>_iou_0.75.pdf
for each variant plus roc_<model>_iou_{0.5,0.75}.pdf (eval.py:241-338,
390-468, gated on --score_thresholds). This script reproduces that tree
with BOTH curve families on the same axes:

- our 3 from-scratch models, from ``dfs/eval_detections.pkl.gz``
  (regenerable via ``python eval.py models/*.msgpack --replace_df``);
- the reference's 6 variants, read straight from its committed cache
  ``/root/reference/dfs/eval_detections.pkl.gz`` and prefixed ``ref_``
  (we cannot retrain heads-only variants without pretrained backbones —
  cli/train.py:9-12 — but their cached curves still plot alongside ours).

Per-model PDFs follow the reference's committed listing: PR only at IoU
0.75, ROC at 0.5 and 0.75.

Usage: python -m tools.gen_eval_figs [--fig_dir figs]
"""

import os

import click
import pandas as pd

OUR_CACHE = "dfs/eval_detections.pkl.gz"
REF_CACHE = "/root/reference/dfs/eval_detections.pkl.gz"
SCORE_THRESHOLDS = [0.2, 0.5]


def merged_detections() -> pd.DataFrame:
    ours = pd.read_pickle(OUR_CACHE)
    ref = pd.read_pickle(REF_CACHE)
    ref = ref.assign(Model="ref_" + ref["Model"])
    return pd.concat([ours, ref], ignore_index=True)


@click.command()
@click.option("--fig_dir", default="figs", show_default=True)
def main(fig_dir):
    import seaborn as sns

    from vbt_tpu.cli.eval import plot_precision_recall, plot_roc

    sns.set_theme(context="paper", style="ticks")
    os.makedirs(fig_dir, exist_ok=True)
    df = merged_detections()

    for iou in (0.5, 0.75):
        d = df.copy()
        d["Label"] = d["IoU"] > iou
        # Per-model PR PDFs exist only at 0.75 in the reference's tree.
        plot_precision_recall(
            d.copy(), fig_dir, iou,
            SCORE_THRESHOLDS if iou == 0.75 else [],
        )
        plot_roc(d.copy(), fig_dir, iou, SCORE_THRESHOLDS)

    n = len([f for f in os.listdir(fig_dir) if f.endswith(".pdf")])
    print(f"{fig_dir}: {n} PDFs")


if __name__ == "__main__":
    main()
