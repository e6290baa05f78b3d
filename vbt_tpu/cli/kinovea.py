"""Compare tracking dataframes against Kinovea manual-trajectory exports.

CLI-compatible with the reference kinovea.py (kinovea.py:29-34): same flags,
defaults, per-clip overlay PDFs, Pearson r / MSE metrics, and LaTeX summary.
"""

from __future__ import annotations

import click

from vbt_tpu.cli._groundtruth import GroundTruthConfig, latex_summary, run_validation
from vbt_tpu.contract.parsers import read_kinovea_export

CONFIG = GroundTruthConfig(
    name="Kinovea",
    own_label="Velocity Tracker",
    export_glob="*.txt",
    read_export=read_kinovea_export,
    plate_smoothing="expanding",
    smooth_xy=True,
    sort_by_time=True,
    equalize_axes="kinovea",
)


@click.command()
@click.option("--kinovea_dir", default="kinovea_exports", show_default=True,
              help="Directory containing the kinovea exports.")
@click.option("--df_dir", default="dfs", show_default=True,
              help="Directory containing the dfs.")
@click.option("--show_fig", is_flag=True, help="Show the figure.", show_default=True)
@click.option("--fig_dir", default=None, show_default=True,
              help="Directory for saving the figures. If not set the figures won't be saved.")
@click.option("--plate_diameter", default=0.45, type=float, show_default=True,
              help="Diameter of the weight plate used in meters.")
def main(kinovea_dir, df_dir, show_fig, fig_dir, plate_diameter):
    """Plot comparisons between kinovea exports and the created dfs."""
    results = run_validation(kinovea_dir, df_dir, show_fig, fig_dir, plate_diameter, CONFIG)
    total_mse_x = sum(r.mse_x for r in results)
    total_mse_y = sum(r.mse_y for r in results)
    print(f"Total MSEx = {total_mse_x}, MSEy = {total_mse_y}")
    print(latex_summary(results))


if __name__ == "__main__":
    main()
