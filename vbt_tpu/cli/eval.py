"""Evaluate detection models: PR and ROC curves against VOC ground truth.

CLI-compatible with the reference eval.py (eval.py:471-480): same flags,
defaults, cached-detections contract (``dfs/eval_detections.pkl.gz`` reused
unless ``--replace_df``, eval.py:506-512), Hungarian ground-truth matching,
and figure outputs. Inference runs through the TPU-native detection pipeline
instead of the TFLite interpreter.
"""

from __future__ import annotations

import ast
import glob
import os

import click
import numpy as np
import pandas as pd

from vbt_tpu.contract.parsers import read_voc_annotations

LABEL = "barbell"


class PythonLiteralOption(click.Option):
    """Parse a Python literal list from the shell (eval.py:26-39)."""

    def type_cast_value(self, ctx, value):
        try:
            return ast.literal_eval(value)
        except Exception:
            raise click.BadParameter(value)


def scaled_bbox(bbox, src_dim, dst_dim):
    """Scale [ymin,xmin,ymax,xmax] from src (h, w) to dst (h, w)
    (eval.py:57-71); truncates to int like the reference."""
    src_h, src_w = src_dim
    dst_h, dst_w = dst_dim
    factors = np.array([dst_h / float(src_h), dst_w / float(src_w)] * 2)
    return (np.asarray(bbox) * factors).astype(int)


def match_bboxes(gt_bboxes: np.ndarray, det_bboxes: np.ndarray):
    """Optimal GT<->detection matching (eval.py:96-153 semantics).

    IoU matrix padded to square with zeros, Hungarian assignment, dummy
    predictions dropped; returns (gt_idx, det_idx, ious) — dummy *GT* rows
    are kept (IoU 0), so every detection yields one row.
    """
    from vbt_tpu.tracking.assignment import linear_assignment

    n_gt = gt_bboxes.shape[0]
    n_det = det_bboxes.shape[0]
    iou = _iou_matrix_host(
        np.asarray(gt_bboxes, np.float64), np.asarray(det_bboxes, np.float64)
    )

    if n_det > n_gt:
        iou = np.concatenate([iou, np.zeros((n_det - n_gt, n_det))], axis=0)
    if n_gt > n_det:
        iou = np.concatenate([iou, np.zeros((n_gt, n_gt - n_det))], axis=1)

    pairs = linear_assignment(1 - iou)
    sel = pairs[:, 1] < n_det
    idx_gt, idx_det = pairs[sel, 0], pairs[sel, 1]
    return idx_gt, idx_det, iou[idx_gt, idx_det]


def _iou_matrix_host(gt: np.ndarray, det: np.ndarray) -> np.ndarray:
    """(G, D) IoU matrix; native C++ when built, numpy loop otherwise."""
    try:
        from vbt_tpu.native import hostops
    except Exception:  # pragma: no cover
        hostops = None
    if hostops is not None and len(gt) and len(det):
        return hostops.iou_matrix(gt, det)
    iou = np.zeros((len(gt), len(det)))
    for i in range(len(gt)):
        for j in range(len(det)):
            iou[i, j] = _iou(det[j], gt[i])
    return iou


def _iou(det_box, gt_box):
    """Scalar IoU of two [ymin,xmin,ymax,xmax] boxes (eval.py:74-93)."""
    iy1 = max(det_box[0], gt_box[0])
    ix1 = max(det_box[1], gt_box[1])
    iy2 = min(det_box[2], gt_box[2])
    ix2 = min(det_box[3], gt_box[3])
    inter = max(0, iy2 - iy1) * max(0, ix2 - ix1)
    area_d = (det_box[2] - det_box[0]) * (det_box[3] - det_box[1])
    area_g = (gt_box[2] - gt_box[0]) * (gt_box[3] - gt_box[1])
    union = area_d + area_g - inter
    return inter / union if union > 0 else 0


def create_detections_df(models, img_dir, annotations, export_path):
    """Run all models over the test images and match against ground truth
    (eval.py:156-215). Detections are kept at threshold 0 (eval.py:179)."""
    import cv2

    from vbt_tpu.runtime.pipeline import DetectionPipeline
    from vbt_tpu.utils.health import require_healthy_tpu

    # The only eval path that touches the device; fail fast on a wedged
    # tunnel instead of hanging in the first detect_batch (round 3 lost a
    # 61-image eval mid-readback to exactly this).
    require_healthy_tpu(context="eval")

    img_files = sorted(glob.glob(f"{img_dir}/*.jpg"))
    scores, model_col, ious = [], [], []
    detections = {}
    for m in models:
        pipeline = DetectionPipeline.from_model_arg(m)
        model_detections = {}
        for f in img_files:
            img = cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB)
            h, w, _ = img.shape
            det = pipeline.detect_batch(img[None])
            n = int(det.count[0])
            boxes_norm = np.asarray(det.boxes[0][:n], np.float64)
            model_detections[os.path.basename(f)] = {
                "boxes": np.stack(
                    [scaled_bbox(b, (1, 1), (h, w)) for b in boxes_norm]
                )
                if n
                else np.zeros((0, 4), int),
                "scores": np.asarray(det.scores[0][:n], np.float32),
            }
        detections[os.path.basename(m).split(".")[0]] = model_detections

    for file, gt_bboxes in annotations.items():
        for model, model_detections in detections.items():
            d = model_detections[file]
            _, det_idx, det_ious = match_bboxes(gt_bboxes, d["boxes"])
            for i, di in enumerate(det_idx):
                scores.append(d["scores"][di])
                ious.append(det_ious[i])
                model_col.append(model)

    df = pd.DataFrame({"Score": scores, "Model": model_col, "IoU": ious})
    df.to_pickle(export_path)
    return df


def plot_precision_recall(df, fig_dir, iou_threshold, score_thresholds=None,
                          fmt="pdf"):
    """PR curves per model with AP annotations (eval.py:218-338).

    ``fmt`` selects the combined-figure format (docs/ ships PNG renders of
    the same curves, reference docs/precision_recall_iou_0.75.png).
    """
    import matplotlib.pyplot as plt
    import seaborn as sns
    from matplotlib.ticker import MultipleLocator
    from sklearn.metrics import average_precision_score, precision_recall_curve

    aps, prcs = {}, []
    for m in pd.unique(df["Model"]):
        dfm = df.query("Model == @m")
        precision, recall, thresholds = precision_recall_curve(
            dfm["Label"], dfm["Score"]
        )
        thresholds = np.concatenate([thresholds, [thresholds[-1]]])
        prcs.append(
            pd.DataFrame(
                {
                    "Precision": precision,
                    "Recall": recall,
                    "Threshold": thresholds,
                    "Model": m,
                }
            )
        )
        aps[m] = average_precision_score(dfm["Label"], dfm["Score"])
    df_prc = pd.concat(prcs, ignore_index=True)

    _, ax = plt.subplots(figsize=(7, 4))
    sns.lineplot(
        ax=ax, data=df_prc, x="Recall", y="Precision", hue="Model", errorbar=None
    )
    ax.set_xlim(0, 1.01)
    ax.set_ylim(0, 1.01)
    ax.spines["top"].set_visible(False)
    ax.spines["right"].set_visible(False)
    handles, labels = ax.get_legend_handles_labels()
    for i, model in enumerate(labels):
        labels[i] += f", AP$_{{{iou_threshold * 100:0.0f}}}={aps[model]:.4f}$"
    ax.legend(handles, labels, loc="lower left")
    ax.yaxis.set_minor_locator(MultipleLocator(0.1))
    ax.grid(which="major", color="gray", linestyle="-", linewidth=0.5, alpha=0.7)
    ax.grid(which="minor", color="gray", linestyle=":", linewidth=0.5, alpha=0.5)
    plt.tight_layout()
    plt.savefig(os.path.join(
        fig_dir, f"precision_recall_iou_{iou_threshold}.{fmt}"), dpi=300)
    plt.close()

    if score_thresholds:
        # Per-model curves with annotated operating points (eval.py:241-338).
        colors = _model_colors(handles, labels)
        for m in pd.unique(df["Model"]):
            dfm = df_prc.query("Model == @m")
            _, ax = plt.subplots(figsize=(7, 3))
            sns.lineplot(ax=ax, data=dfm, x="Recall", y="Precision",
                         hue="Model", errorbar=None, palette=[colors[m]])
            ax.set_xlim(0, 1.01)
            ax.set_ylim(0, 1.01)
            ax.spines["top"].set_visible(False)
            ax.spines["right"].set_visible(False)
            h2, l2 = ax.get_legend_handles_labels()
            l2 = [f"{model}, AP={aps[model]:.4f}" for model in l2]
            ax.legend(h2, l2, loc="lower left")
            ax.xaxis.set_minor_locator(MultipleLocator(0.05))
            ax.yaxis.set_minor_locator(MultipleLocator(0.05))
            ax.grid(which="major", color="gray", linestyle="-", linewidth=0.5, alpha=0.7)
            ax.grid(which="minor", color="gray", linestyle=":", linewidth=0.5, alpha=0.5)
            for i, v in enumerate(score_thresholds[::-1]):
                row = dfm.loc[(dfm["Threshold"] - v).abs().idxmin()]
                ax.annotate(
                    f"{row['Threshold']:.4f}",
                    xy=(row["Recall"], row["Precision"]),
                    xycoords="data",
                    xytext=(-50, -(min(i, 3) + 1) * 15),
                    textcoords="offset points",
                    arrowprops=dict(arrowstyle="->", color="k",
                                    connectionstyle="arc3,rad=+0.1", relpos=(1, 1)),
                    fontsize=10,
                )
            plt.tight_layout()
            plt.savefig(os.path.join(fig_dir, f"precision_recall_{m}_iou_{iou_threshold}.pdf"))
            plt.close()
    return aps


def _model_colors(handles, labels):
    """Color per model from the combined-plot legend, robust name matching
    (documents the reference's fragile startswith check, eval.py:285)."""
    colors = {}
    for handle, label in zip(handles, labels):
        model = label.split(",")[0]
        colors[model] = handle.get_color()
    return colors


def plot_roc(df, fig_dir, iou_threshold, score_thresholds=None, fmt="pdf"):
    """ROC curves per model with AUC annotations (eval.py:341-468)."""
    import matplotlib.pyplot as plt
    import seaborn as sns
    from matplotlib.ticker import MultipleLocator
    from sklearn.metrics import roc_auc_score, roc_curve

    rocs, aucs = [], {}
    for m in pd.unique(df["Model"]):
        dfm = df.query("Model == @m")
        fpr, tpr, thresholds = roc_curve(dfm["Label"], dfm["Score"])
        rocs.append(
            pd.DataFrame(
                {"FP Rate": fpr, "TP Rate": tpr, "Threshold": thresholds, "Model": m}
            )
        )
        aucs[m] = roc_auc_score(dfm["Label"], dfm["Score"])
    df_roc = pd.concat(rocs, ignore_index=True)

    _, ax = plt.subplots(figsize=(7, 4))
    sns.lineplot(
        ax=ax, data=df_roc, x="FP Rate", y="TP Rate", hue="Model", errorbar=None
    )
    ax.set_xlim(0, 1.01)
    ax.set_ylim(0, 1.01)
    ax.spines["top"].set_visible(False)
    ax.spines["right"].set_visible(False)
    handles, labels = ax.get_legend_handles_labels()
    for i, model in enumerate(labels):
        labels[i] += f", AUC={aucs[model]:.4f}"
    ax.legend(handles, labels, loc="lower right")
    ax.xaxis.set_minor_locator(MultipleLocator(0.1))
    ax.yaxis.set_minor_locator(MultipleLocator(0.1))
    ax.grid(which="major", color="gray", linestyle="-", linewidth=0.5, alpha=0.7)
    ax.grid(which="minor", color="gray", linestyle=":", linewidth=0.5, alpha=0.5)
    plt.tight_layout()
    plt.savefig(os.path.join(fig_dir, f"roc_iou_{iou_threshold}.{fmt}"), dpi=300)
    plt.close()

    if score_thresholds:
        # Per-model ROC curves with annotated thresholds (eval.py:390-468).
        colors = _model_colors(handles, labels)
        for m in pd.unique(df["Model"]):
            dfm = df_roc.query("Model == @m")
            _, ax = plt.subplots(figsize=(7, 3))
            sns.lineplot(ax=ax, data=dfm, x="FP Rate", y="TP Rate",
                         hue="Model", errorbar=None, palette=[colors[m]])
            ax.set_xlim(0, 1.01)
            ax.set_ylim(0, 1.01)
            ax.spines["top"].set_visible(False)
            ax.spines["right"].set_visible(False)
            h2, l2 = ax.get_legend_handles_labels()
            l2 = [f"{model}, AUC={aucs[model]:.4f}" for model in l2]
            ax.legend(h2, l2, loc="lower right")
            ax.xaxis.set_minor_locator(MultipleLocator(0.05))
            ax.yaxis.set_minor_locator(MultipleLocator(0.05))
            ax.grid(which="major", color="gray", linestyle="-", linewidth=0.5, alpha=0.7)
            ax.grid(which="minor", color="gray", linestyle=":", linewidth=0.5, alpha=0.5)
            for i, v in enumerate(score_thresholds):
                row = dfm.loc[(dfm["Threshold"] - v).abs().idxmin()]
                ax.annotate(
                    f"{row['Threshold']:.4f}",
                    xy=(row["FP Rate"], row["TP Rate"]),
                    xycoords="data",
                    xytext=((len(score_thresholds) - i) * 8, -(i + 1) * 15),
                    textcoords="offset points",
                    arrowprops=dict(arrowstyle="->", color="k",
                                    connectionstyle="arc3,rad=-0.1", relpos=(0, 1)),
                    fontsize=10,
                )
            plt.tight_layout()
            plt.savefig(os.path.join(fig_dir, f"roc_{m}_iou_{iou_threshold}.pdf"))
            plt.close()
    return aucs


@click.command()
@click.argument("models", type=str, nargs=-1)
@click.option("--img_dir", default="data/test", show_default=True,
              help="Directory containing the JPG test images.")
@click.option("--annotations_dir", default="data/test", show_default=True,
              help="Directory containing the XML annotation files.")
@click.option("--fig_dir", default=None, show_default=True,
              help="Directory for saving the figures. If not set the figures won't be saved.")
@click.option("--iou_threshold", default=0.5, type=float, show_default=True,
              help="Intersection over union threshold to label detections as correct or not when calculated against the ground truth bounding boxes.")
@click.option("--threads", default=4, show_default=True,
              help="Kept for CLI compatibility; the TPU pipeline ignores it.")
@click.option("--detections_df", default="dfs/eval_detections.pkl.gz", show_default=True,
              help="Path for storing/reading the detection results dataframe.")
@click.option("--replace_df", is_flag=True, show_default=True,
              help="If exists, replace the detections dataframe.")
@click.option("--score_thresholds", default="[]", cls=PythonLiteralOption, show_default=True,
              help='List of score thresholds to plot on the ROC curves, e.g. "[0.2, 0.5]".')
def main(models, img_dir, annotations_dir, fig_dir, iou_threshold, threads,
         detections_df, replace_df, score_thresholds):
    """Plot Precision-Recall and ROC curves for the specified models."""
    del threads
    import seaborn as sns

    sns.set_theme(context="paper", style="ticks")

    annotations = read_voc_annotations(annotations_dir, label=LABEL)

    if not os.path.exists(detections_df) or replace_df:
        print(f"Creating dataframe '{detections_df}'.")
        os.makedirs(os.path.dirname(detections_df) or ".", exist_ok=True)
        df = create_detections_df(models, img_dir, annotations, detections_df)
    else:
        print(f"Loading dataframe '{detections_df}'.")
        df = pd.read_pickle(detections_df)

    df["Label"] = df["IoU"] > iou_threshold

    if fig_dir is not None:
        os.makedirs(fig_dir, exist_ok=True)
        plot_precision_recall(df.copy(), fig_dir, iou_threshold, score_thresholds)
        plot_roc(df.copy(), fig_dir, iou_threshold, score_thresholds)


if __name__ == "__main__":
    main()
