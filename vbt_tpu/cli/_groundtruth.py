"""Shared engine for ground-truth trajectory validation CLIs.

The reference implements this twice with small deltas (kinovea.py:35-239 and
qualysis.py:35-248); here the common flow is factored once and the deltas are
expressed as a :class:`GroundTruthConfig`:

- export parser (Kinovea txt in cm vs Qualisys tsv in mm with x negated),
- plate-dimension smoothing (expanding mean at kinovea.py:103-104 vs
  rolling-30 mean at qualysis.py:114-117),
- x/y smoothing (rolling-5 at kinovea.py:106-108 vs none in qualysis.py),
- overlay labels and the axis-equalisation variant.

Flow per clip: pixel->meter scaling by plate size (x*d/width, y negated,
kinovea.py:110-113), mean-shift alignment (kinovea.py:118-122), 30 Hz linear
resampling on the overlapping window, Pearson r + MSE per axis
(kinovea.py:157-177), overlay PDFs, and a LaTeX summary table
(kinovea.py:202-236).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from math import ceil
from typing import Callable

import numpy as np
import pandas as pd

from vbt_tpu.contract.schema import parse_df_filename


@dataclass(frozen=True)
class GroundTruthConfig:
    name: str  # legend label for the ground-truth curve
    own_label: str  # legend label for our trajectory
    export_glob: str  # filename pattern inside the export dir
    read_export: Callable[[str], pd.DataFrame]  # -> (time, x, y) in meters
    plate_smoothing: str  # 'expanding' | 'rolling30'
    smooth_xy: bool  # rolling-5 on x/y before scaling
    sort_by_time: bool  # kinovea.py:99 sorts; qualysis.py does not
    equalize_axes: str  # 'kinovea' | 'qualisys' axis-span balancing variant


@dataclass
class ClipResult:
    video: str
    mse_x: float
    mse_y: float
    r_x: float
    p_x: float
    r_y: float
    p_y: float


def scale_to_meters(df: pd.DataFrame, plate_diameter: float, cfg: GroundTruthConfig) -> pd.DataFrame:
    """Convert normalized image coordinates to meters via the plate size."""
    out = df.drop(columns=["dx", "dy"])

    if cfg.sort_by_time:
        out = out.sort_values(by="time")

    if cfg.plate_smoothing == "expanding":
        for col in ["norm_plate_height", "norm_plate_width"]:
            out[col] = out[col].expanding(min_periods=1).mean()
    else:  # rolling30 (qualysis.py:114-117)
        for col in ["norm_plate_width", "norm_plate_height"]:
            out[col] = out[col].rolling(window=30, center=False, min_periods=1).mean()

    if cfg.smooth_xy:
        for col in ["x", "y"]:
            out[col] = out[col].rolling(window=5, center=False, min_periods=1).mean()

    out["x"] = out["x"] * plate_diameter / out["norm_plate_width"]
    # y grows downward in image coordinates -> negate (kinovea.py:111-113)
    out["y"] = -out["y"] * plate_diameter / out["norm_plate_height"]
    return out.drop(columns=["norm_plate_width", "norm_plate_height"])


def align_mean_shift(ours: pd.DataFrame, truth: pd.DataFrame) -> pd.DataFrame:
    """Shift our trajectory so per-axis means coincide (kinovea.py:118-122)."""
    ours = ours.copy()
    ours["y"] += truth["y"].mean() - ours["y"].mean()
    ours["x"] += truth["x"].mean() - ours["x"].mean()
    return ours


def correlate(ours: pd.DataFrame, truth: pd.DataFrame) -> tuple[float, float, float, float, float, float]:
    """Resample both trajectories to 30 Hz on the overlap and compare.

    Returns (r_x, p_x, r_y, p_y, mse_x, mse_y) — kinovea.py:157-177.
    """
    from scipy.interpolate import interp1d
    from scipy.stats import pearsonr
    from sklearn.metrics import mean_squared_error

    t_max = min(truth["time"].max(), ours["time"].max())
    t_min = max(truth["time"].min(), ours["time"].min())
    ts = np.linspace(t_min, t_max, int(t_max * 30))  # 30 fps

    def resample(df, col):
        return interp1d(df["time"], df[col], kind="linear")(ts)

    x_t, x_o = resample(truth, "x"), resample(ours, "x")
    y_t, y_o = resample(truth, "y"), resample(ours, "y")

    rx = pearsonr(x_t, x_o)
    ry = pearsonr(y_t, y_o)
    return (
        float(rx.statistic),
        float(rx.pvalue),
        float(ry.statistic),
        float(ry.pvalue),
        float(mean_squared_error(x_t, x_o)),
        float(mean_squared_error(y_t, y_o)),
    )


def overlay_figure(truth: pd.DataFrame, ours: pd.DataFrame, cfg: GroundTruthConfig):
    """Two-panel X/Y overlay of ground truth vs our trajectory."""
    import matplotlib.pyplot as plt
    import seaborn as sns

    fig, axs = plt.subplots(2, sharex=True, figsize=(8, 4))
    for ax, col in zip(axs, ["x", "y"]):
        sns.lineplot(ax=ax, x="time", y=col, data=truth, label=cfg.name)
        sns.lineplot(ax=ax, x="time", y=col, data=ours, label=cfg.own_label)

    x_max = ceil(axs[1].get_xlim()[1])
    plt.xticks(range(0, x_max, 5), range(0, x_max, 5), minor=False)
    plt.xticks(range(0, x_max, 1), [], minor=True)
    plt.xlim(0, max(truth["time"].max(), ours["time"].max()))
    plt.xlabel("Čas [s]")

    x_span = axs[0].get_ylim()[1] - axs[0].get_ylim()[0]
    y_span = axs[1].get_ylim()[1] - axs[1].get_ylim()[0]
    if cfg.equalize_axes == "kinovea":
        # kinovea.py:146-150: widen only the X panel when it is narrower.
        if abs(x_span) < abs(y_span):
            lo, hi = axs[0].get_ylim()
            axs[0].set_ylim(lo - y_span / 2, hi + y_span / 2)
    else:
        # qualysis.py:151-157: widen whichever panel is narrower.
        if x_span > y_span:
            lo, hi = axs[1].get_ylim()
            axs[1].set_ylim(lo - x_span / 2, hi + x_span / 2)
        else:
            lo, hi = axs[0].get_ylim()
            axs[0].set_ylim(lo - y_span / 2, hi + y_span / 2)

    axs[0].set_ylabel("X [m]")
    axs[1].set_ylabel("Y [m]")

    handles, labels = axs[0].get_legend_handles_labels()
    fig.legend(handles, labels, loc="upper right", ncols=2, framealpha=1.0)
    axs[0].legend().set_visible(False)
    axs[1].legend().set_visible(False)
    plt.tight_layout()
    return fig


def latex_summary(results: list[ClipResult]) -> str:
    """Render the LaTeX summary table (kinovea.py:202-236)."""
    df = pd.DataFrame(
        {
            "video": [r.video for r in results],
            "mse_x": [r.mse_x for r in results],
            "mse_y": [r.mse_y for r in results],
            "result_x": [r.r_x for r in results],
            "result_y": [r.r_y for r in results],
        }
    ).sort_values(by="video")

    df["video"] = df["video"].map(lambda v: f"\\texttt{{{v.replace('_', chr(92) + '_')}}}")
    for col in ["mse_x", "mse_y", "result_x", "result_y"]:
        df[col] = df[col].map("${:.4f}$".format)

    df = df.rename(
        columns={
            "video": "Video",
            "mse_x": "$\\text{MSE}_x$",
            "mse_y": "$\\text{MSE}_y$",
            "result_x": "$r_x$",
            "result_y": "$r_y$",
        }
    )
    return df.to_latex(index=False)


def run_validation(
    export_dir: str,
    df_dir: str,
    show_fig: bool,
    fig_dir: str | None,
    plate_diameter: float,
    cfg: GroundTruthConfig,
) -> list[ClipResult]:
    import matplotlib.pyplot as plt
    import seaborn as sns

    sns.set_theme(context="paper", style="ticks")
    sns.set_palette("rocket", 2)

    export_files = glob.glob(os.path.join(export_dir, cfg.export_glob))
    df_files = glob.glob(os.path.join(df_dir, "*.pkl.gz"))
    if fig_dir is not None:
        os.makedirs(fig_dir, exist_ok=True)

    results: list[ClipResult] = []
    for export_file in export_files:
        stem = os.path.basename(export_file).split(".")[0]
        match = next(
            (p for p in df_files if os.path.basename(p).startswith(stem)), None
        )
        if match is None:
            print(f"No matching df file found for: {export_file}")
            continue
        parsed = parse_df_filename(match)
        if parsed is None:
            continue

        truth = cfg.read_export(export_file)
        ours = pd.read_pickle(match)
        ours = ours.query(f"id == {parsed.tracking_id}").drop(columns=["id"])
        ours = scale_to_meters(ours, plate_diameter, cfg)
        ours = align_mean_shift(ours, truth)

        fig = overlay_figure(truth, ours, cfg)
        r_x, p_x, r_y, p_y, mse_x, mse_y = correlate(ours, truth)
        results.append(
            ClipResult(
                video=parsed.video,
                mse_x=mse_x,
                mse_y=mse_y,
                r_x=r_x,
                p_x=p_x,
                r_y=r_y,
                p_y=p_y,
            )
        )

        if show_fig:
            plt.show()
        if fig_dir is not None:
            fig.savefig(
                os.path.join(
                    fig_dir, f"{parsed.video}_id{parsed.tracking_id}_{parsed.model}.pdf"
                )
            )
        plt.close(fig)

    return results
