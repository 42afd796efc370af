"""Classification metric groups: confusion matrices, per-label and macro
P/R/F1, balanced accuracy + MCC
(reference: metrics/classification.py:34-302)."""

from __future__ import annotations

from collections import Counter

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import sklearn.metrics
from scipy.cluster.hierarchy import leaves_list, linkage
from scipy.spatial.distance import squareform
from sklearn.metrics.pairwise import cosine_distances

from mermaid_classifier_tpu.metrics.context import MetricsContext
from mermaid_classifier_tpu.metrics.groups import metric_group
from mermaid_classifier_tpu.metrics.outputs import GroupOutput


def _hierarchical_class_order(val_results) -> list[int]:
    """Order classes by hierarchically clustering their row-normalized
    confusion profiles, revealing block structure
    (reference: classification.py:34-61)."""
    n_classes = len(val_results.classes)
    if n_classes < 3:
        return list(range(n_classes))
    cm = sklearn.metrics.confusion_matrix(
        y_true=val_results.gt, y_pred=val_results.est, labels=range(n_classes)
    )
    row_sums = cm.sum(axis=1, keepdims=True)
    row_sums[row_sums == 0] = 1
    profiles = cm / row_sums
    dist = cosine_distances(profiles)
    np.fill_diagonal(dist, 0)
    dist = (dist + dist.T) / 2
    linkage_matrix = linkage(squareform(dist, checks=False), method="average")
    return list(leaves_list(linkage_matrix))


# Longest raster side for confusion-matrix PNGs. At 80 classes the figure
# is 48 in; dpi 100 + bbox_inches="tight" re-renders the 6,400-text canvas
# twice at 4800 px and cost 58 s of every metrics stage (measured in
# metrics_group_seconds.json at C2 scale). Capping the long side at
# 2400 px (>=30 px per cell at 80 classes, labels verified legible) and
# saving without the tight-bbox measuring pass brings the group to ~20 s
# with the same artifact content (docs/perf_roofline.md).
_CONFUSION_MAX_RASTER_PX = 2400


def _confusion_figure(matrix: np.ndarray, names: list[str]):
    """Returns (figure, savefig kwargs) — the kwargs cap raster size and
    skip the tight-bbox pass (tight_layout below already fits the labels)."""
    n = len(names)
    fig_size = max(12, n * 0.6)
    fig, ax = plt.subplots(figsize=(fig_size, fig_size))
    try:
        display = sklearn.metrics.ConfusionMatrixDisplay(
            confusion_matrix=matrix, display_labels=names
        )
        display.plot(ax=ax, cmap="Blues", values_format="d", colorbar=False)
        ax.xaxis.set_label_position("top")
        ax.xaxis.set_ticks_position("top")
        font_size = max(8, min(12, 150 / max(n, 1)))
        plt.setp(
            ax.get_xticklabels(),
            rotation=45,
            ha="left",
            rotation_mode="anchor",
            fontsize=font_size,
        )
        plt.setp(ax.get_yticklabels(), fontsize=font_size)
        plt.tight_layout()
    except Exception:
        plt.close(fig)
        raise
    dpi = min(100.0, _CONFUSION_MAX_RASTER_PX / fig_size)
    return fig, {"dpi": dpi, "bbox_inches": None}


@metric_group("confusion_matrices")
def compute_confusion_matrices(ctx: MetricsContext) -> GroupOutput:
    """Frequency and percent-normalized confusion matrices, rows/cols
    reordered by the clustering order, as CSV + figure artifacts."""
    out = GroupOutput()
    val_results = ctx.val_results
    order = _hierarchical_class_order(val_results)
    names = [
        ctx.ba_library.bagf_id_to_name(val_results.classes[i], ctx.gf_library)
        for i in order
    ]
    for normalize, filestem in (
        (False, "confusion_matrix/frequencies"),
        (True, "confusion_matrix/percents"),
    ):
        matrix = sklearn.metrics.confusion_matrix(
            y_true=val_results.gt,
            y_pred=val_results.est,
            labels=range(len(val_results.classes)),
            normalize="true" if normalize else None,
        )
        if normalize:
            # 0-1 fractions -> integer percents for readability.
            matrix = np.floor(matrix * 100).astype(np.int64)
        matrix = matrix[np.ix_(order, order)]
        df = pd.DataFrame(matrix, columns=names)
        df.insert(0, "-", names)
        out.table(df, filestem)
        fig, save_kwargs = _confusion_figure(matrix, names)
        out.figure(fig, filestem + ".png", **save_kwargs)
    return out


@metric_group("precision_recall_f1")
def compute_precision_recall_f1(ctx: MetricsContext) -> GroupOutput:
    """Per-label P/R/F1 (CSV) + macro P/R/F1 (scalars and YAML)."""
    val_results = ctx.val_results
    classes = list(val_results.classes)
    gt_labels = [classes[i] for i in val_results.gt]
    est_labels = [classes[i] for i in val_results.est]
    label_counts = Counter(gt_labels)

    # Per-label: one-vs-rest counts. For a single label, precision =
    # TP/(TP+FP) and recall = TP/(TP+FN) with 0 for empty denominators.
    per_label = []
    gt_arr = np.asarray(gt_labels)
    est_arr = np.asarray(est_labels)
    for label in classes:
        tp = int(np.sum((gt_arr == label) & (est_arr == label)))
        fp = int(np.sum((gt_arr != label) & (est_arr == label)))
        fn = int(np.sum((gt_arr == label) & (est_arr != label)))
        precision = tp / (tp + fp) if (tp + fp) else 0.0
        recall = tp / (tp + fn) if (tp + fn) else 0.0
        f1 = (
            2 * precision * recall / (precision + recall)
            if (precision + recall)
            else 0.0
        )
        per_label.append(
            {
                "bagf_name": ctx.ba_library.bagf_id_to_name(label, ctx.gf_library),
                "precision": ctx.format_func(precision),
                "recall": ctx.format_func(recall),
                "f1_score": ctx.format_func(f1),
                "n_samples": int(label_counts.get(label, 0)),
                "bagf_id": label,
            }
        )

    precision_macro = sklearn.metrics.precision_score(
        gt_labels, est_labels, average="macro", zero_division=0.0
    )
    recall_macro = sklearn.metrics.recall_score(
        gt_labels, est_labels, average="macro", zero_division=0.0
    )
    f1_macro = (
        2 * precision_macro * recall_macro / (precision_macro + recall_macro)
        if (precision_macro + recall_macro) > 0
        else 0.0
    )
    overall = {
        "precision_macro": ctx.format_func(precision_macro),
        "recall_macro": ctx.format_func(recall_macro),
        "f1_macro": ctx.format_func(f1_macro),
    }

    out = GroupOutput()
    for k, v in overall.items():
        out.scalar(k, v)
    out.table(pd.DataFrame(per_label), "metrics_per_label")
    out.mapping(overall, "metrics_overall.yaml")
    return out


@metric_group("balanced_accuracy_mcc")
def compute_balanced_accuracy_mcc(ctx: MetricsContext) -> GroupOutput:
    """Balanced accuracy (macro recall) + Matthews correlation coefficient."""
    classes = list(ctx.val_results.classes)
    gt_labels = [classes[i] for i in ctx.val_results.gt]
    est_labels = [classes[i] for i in ctx.val_results.est]
    return (
        GroupOutput()
        .scalar(
            "balanced_accuracy",
            ctx.format_func(
                sklearn.metrics.balanced_accuracy_score(gt_labels, est_labels)
            ),
        )
        .scalar(
            "mcc",
            ctx.format_func(
                sklearn.metrics.matthews_corrcoef(gt_labels, est_labels)
            ),
        )
    )
