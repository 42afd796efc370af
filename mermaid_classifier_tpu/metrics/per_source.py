"""Per-source metric group: validation metrics grouped by data source, with
the alignment invariant check (reference: metrics/per_source.py:43-183)."""

from __future__ import annotations

import warnings
from collections import Counter

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
from sklearn.metrics import (
    accuracy_score,
    balanced_accuracy_score,
    precision_recall_fscore_support,
)

from mermaid_classifier_tpu.common.taxonomy import split_ba_gf
from mermaid_classifier_tpu.metrics.context import MetricsContext
from mermaid_classifier_tpu.metrics.groups import metric_group
from mermaid_classifier_tpu.metrics.outputs import GroupOutput
from mermaid_classifier_tpu.metrics.taxonomy_index import build_ba_paths, find_lca


@metric_group("per_source", needs=("dataset",))
def compute_per_source(ctx: MetricsContext) -> GroupOutput:
    val_results = ctx.val_results
    dataset = ctx.dataset
    assert dataset is not None
    classes = list(val_results.classes)
    out = GroupOutput()

    feature_path_to_source = getattr(dataset, "feature_path_to_source", None)
    if not feature_path_to_source:
        # Re-evaluation paths may lack the per-image source map; skip.
        return out

    # Per-val-index source keys: evaluate_classifier streams images in
    # sorted key order, each image's points contiguous.
    source_per_index: list[str] = []
    images_per_source: Counter = Counter()
    for key in sorted(dataset.labels.val.data.keys()):
        site, project_id = feature_path_to_source[key]
        source_key = f"{site}:{project_id}"
        source_per_index.extend([source_key] * len(dataset.labels.val.data[key]))
        images_per_source[source_key] += 1

    if len(source_per_index) != len(val_results.gt):
        # Defensive: never emit a silently-misaligned breakdown
        # (reference: per_source.py:70-78).
        raise ValueError(
            f"Per-source index count ({len(source_per_index)}) does not match"
            f" val_results length ({len(val_results.gt)})."
            " dataset.labels.val iteration order may have diverged from"
            " evaluate_classifier."
        )

    sources = np.asarray(source_per_index)
    gt = np.asarray(val_results.gt)
    est = np.asarray(val_results.est)
    ba_paths = ctx.ba_paths or build_ba_paths(classes, ctx.ba_library)

    rows = []
    accuracies = []
    for source_key in sorted(set(source_per_index)):
        mask = sources == source_key
        gt_s, est_s = gt[mask], est[mask]
        n = int(mask.sum())
        if n == 0:
            continue
        site, source_id = source_key.split(":", 1)
        accuracy = float(accuracy_score(gt_s, est_s))
        accuracies.append(accuracy)
        try:
            with warnings.catch_warnings():
                warnings.filterwarnings(
                    "ignore",
                    message="A single label was found in 'y_true' and 'y_pred'",
                    category=UserWarning,
                )
                balanced_acc = float(balanced_accuracy_score(gt_s, est_s))
        except ValueError:
            balanced_acc = float("nan")
        prec, rec, f1, _ = precision_recall_fscore_support(
            gt_s, est_s, average="macro", zero_division=0
        )

        err_total = err_cross = 0
        for g, e in zip(gt_s, est_s):
            if g == e:
                continue
            err_total += 1
            if (
                find_lca(
                    split_ba_gf(classes[g])[0], split_ba_gf(classes[e])[0], ba_paths
                )
                is None
            ):
                err_cross += 1
        rows.append(
            {
                "source_key": source_key,
                "site": site,
                "source_id": source_id,
                "num_val_images": int(images_per_source[source_key]),
                "num_val_annotations": n,
                "accuracy": round(accuracy, 4),
                "balanced_accuracy": round(balanced_acc, 4),
                "f1_macro": round(float(f1), 4),
                "precision_macro": round(float(prec), 4),
                "recall_macro": round(float(rec), 4),
                "cross_branch_error_rate": round(
                    err_cross / err_total if err_total else 0.0, 4
                ),
            }
        )

    if not rows:
        return out

    df = (
        pd.DataFrame(rows)
        .sort_values("num_val_annotations", ascending=False)
        .reset_index(drop=True)
    )
    out.table(df, "per_source/metrics")
    out.scalar("per_source/n_sources", float(len(rows)))
    out.scalar("per_source/min_accuracy", float(min(accuracies)))
    out.scalar("per_source/max_accuracy", float(max(accuracies)))

    if len(df) > 1:
        fig, ax = plt.subplots(figsize=(10, max(4, len(df) * 0.4)))
        try:
            ax.barh(range(len(df)), df["accuracy"], color="#1976d2", alpha=0.85)
            ax.set_yticks(range(len(df)))
            ax.set_yticklabels(df["source_key"], fontsize=9)
            ax.invert_yaxis()
            ax.set_xlim(0, 1.05)
            ax.set_xlabel("Accuracy")
            ax.set_title("Validation Accuracy by Source")
            plt.tight_layout()
        except Exception:
            plt.close(fig)
            raise
        out.figure(fig, "per_source/accuracy_by_source.png")
    return out
