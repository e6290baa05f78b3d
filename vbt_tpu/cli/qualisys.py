"""Compare tracking dataframes against Qualisys motion-capture exports.

CLI-compatible with the reference qualysis.py (qualysis.py:29-34): same flags,
defaults, overlay PDFs, Pearson r / MSE metrics, and LaTeX summary. Variant
deltas vs the Kinovea validation: rolling-30 plate smoothing, no x/y
smoothing (qualysis.py:114-124).
"""

from __future__ import annotations

import click

from vbt_tpu.cli._groundtruth import GroundTruthConfig, latex_summary, run_validation
from vbt_tpu.contract.parsers import read_qualisys_export

CONFIG = GroundTruthConfig(
    name="Qualysis",
    own_label="Vlastné",
    export_glob="*.tsv",
    read_export=read_qualisys_export,
    plate_smoothing="rolling30",
    smooth_xy=False,
    sort_by_time=False,
    equalize_axes="qualisys",
)


@click.command()
@click.option("--qualysis_dir", default="qualysis_exports", show_default=True,
              help="Directory containing the qualysis exports.")
@click.option("--df_dir", default="qualysis_dfs", show_default=True,
              help="Directory containing the dfs.")
@click.option("--show_fig", is_flag=True, help="Show the figure.", show_default=True)
@click.option("--fig_dir", default=None, show_default=True,
              help="Directory for saving the figures. If not set the figures won't be saved.")
@click.option("--plate_diameter", default=0.45, type=float, show_default=True,
              help="Diameter of the weight plate used in meters.")
def main(qualysis_dir, df_dir, show_fig, fig_dir, plate_diameter):
    """Plot comparisons between qualysis exports and the created dfs."""
    results = run_validation(qualysis_dir, df_dir, show_fig, fig_dir, plate_diameter, CONFIG)
    print(latex_summary(results))


if __name__ == "__main__":
    main()
