"""Regenerate the reference's docs/ README images (reference docs/: plot.png,
precision_recall_iou_0.75.png, roc_iou_0.75.png) from OUR artifacts.

- plot.png: the plot-CLI two-panel figure for the first squat clip's golden
  dataframe (same content family as the reference's README image).
- precision_recall_iou_0.75.png / roc_iou_0.75.png: PNG renders of the same
  combined curves that figs/ ships as PDFs (ours + the reference's cached
  curves, tools/gen_eval_figs.py).

Usage: python -m tools.gen_docs_pngs [--docs_dir docs]
"""

import os
import sys

import click
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# The same golden input the figs/ tree renders from (our dfs/ ships only the
# eval cache; the per-clip dataframes are the reference's committed goldens).
PLOT_DF = "/root/reference/dfs/001_squat_6reps_id1_efficientdet_lite0_whole.pkl.gz"


@click.command()
@click.option("--docs_dir", default="docs", show_default=True)
def main(docs_dir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    from tools.gen_eval_figs import SCORE_THRESHOLDS, merged_detections
    from vbt_tpu.cli.eval import plot_precision_recall, plot_roc
    from vbt_tpu.cli.plot import (
        analyze_phases,
        parse_df_filename,
        render_figure,
        smooth_track_df,
    )

    sns.set_theme(context="paper", style="ticks")
    os.makedirs(docs_dir, exist_ok=True)

    parsed = parse_df_filename(PLOT_DF)
    df = pd.read_pickle(PLOT_DF)
    df = df.query(f"id == {parsed.tracking_id}").drop(columns=["id"])
    df = smooth_track_df(df)
    phases = analyze_phases(df, plate_diameter=0.45, engine="host")
    render_figure(df, phases)
    plt.savefig(os.path.join(docs_dir, "plot.png"), dpi=300)
    plt.close()

    d = merged_detections()
    d["Label"] = d["IoU"] > 0.75
    # score_thresholds=[] keeps this to the combined figure only (the
    # per-model operating-point PDFs already live in figs/).
    plot_precision_recall(d.copy(), docs_dir, 0.75, [], fmt="png")
    plot_roc(d.copy(), docs_dir, 0.75, [], fmt="png")
    print(f"{docs_dir}: {sorted(os.listdir(docs_dir))}")


if __name__ == "__main__":
    main()
