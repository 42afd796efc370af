"""Cover metric group: per-image cover reconstruction quality
(reference: metrics/cover.py:24-146).

Cover = the fraction of an image's points assigned to each class — the
quantity reef monitoring actually consumes. Per-class bias/RMSE/MAE/R²
between predicted and true per-image cover vectors, aggregated over classes
with > 0.5% mean cover.
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
from sklearn.metrics import r2_score

from mermaid_classifier_tpu.metrics.context import MetricsContext
from mermaid_classifier_tpu.metrics.groups import metric_group
from mermaid_classifier_tpu.metrics.outputs import GroupOutput


@metric_group("cover", needs=("dataset",))
def compute_cover(ctx: MetricsContext) -> GroupOutput:
    val_results = ctx.val_results
    dataset = ctx.dataset
    assert dataset is not None
    classes = list(val_results.classes)

    present = sorted({classes[i] for i in set(val_results.gt) | set(val_results.est)})
    class_to_idx = {c: i for i, c in enumerate(present)}
    n_classes = len(present)

    gt_labels = [classes[i] for i in val_results.gt]
    est_labels = [classes[i] for i in val_results.est]

    # Per-image cover vectors: evaluate_classifier streams images in sorted
    # key order with each image's points contiguous (data/labels.py), so the
    # flat gt/est arrays slice cleanly per image.
    val_images = sorted(dataset.labels.val.data.keys())
    true_cover = np.zeros((len(val_images), n_classes))
    pred_cover = np.zeros((len(val_images), n_classes))
    offset = 0
    for img_idx, key in enumerate(val_images):
        n_points = len(dataset.labels.val.data[key])
        for label in gt_labels[offset : offset + n_points]:
            true_cover[img_idx, class_to_idx[label]] += 1
        for label in est_labels[offset : offset + n_points]:
            pred_cover[img_idx, class_to_idx[label]] += 1
        true_cover[img_idx] /= n_points
        pred_cover[img_idx] /= n_points
        offset += n_points

    errors = pred_cover - true_cover
    per_class_r2 = np.full(n_classes, np.nan)
    for i in range(n_classes):
        if true_cover[:, i].std() > 0:
            per_class_r2[i] = r2_score(true_cover[:, i], pred_cover[:, i])

    cover_df = pd.DataFrame(
        {
            "bagf_id": present,
            "bagf_name": [
                ctx.ba_library.bagf_id_to_name(c, ctx.gf_library) for c in present
            ],
            "mean_true_cover_pct": true_cover.mean(axis=0) * 100,
            "bias_pct": errors.mean(axis=0) * 100,
            "rmse_pct": np.sqrt((errors**2).mean(axis=0)) * 100,
            "mae_pct": np.abs(errors).mean(axis=0) * 100,
            "r_squared": per_class_r2,
        }
    ).sort_values("mean_true_cover_pct", ascending=False)

    significant = cover_df[cover_df["mean_true_cover_pct"] > 0.5]
    out = GroupOutput()
    if len(significant) > 0:
        r2_values = significant["r_squared"].dropna()
        median_r2 = float(r2_values.median()) if len(r2_values) else float("nan")
        out.scalar(
            "cover_mean_abs_bias_pct", float(significant["bias_pct"].abs().mean())
        )
        out.scalar("cover_mean_rmse_pct", float(significant["rmse_pct"].mean()))
        out.scalar("cover_mean_mae_pct", float(significant["mae_pct"].mean()))
        out.scalar("cover_median_r_squared", median_r2)
    else:
        for name in (
            "cover_mean_abs_bias_pct",
            "cover_mean_rmse_pct",
            "cover_mean_mae_pct",
            "cover_median_r_squared",
        ):
            out.scalar(name, 0.0)

    out.table(cover_df, "cover/per_class_cover_metrics")

    top_n = min(20, len(significant))
    if top_n > 0:
        top = significant.head(top_n)
        fig, ax = plt.subplots(figsize=(10, 6))
        try:
            colors = ["#d32f2f" if b > 0 else "#1976d2" for b in top["bias_pct"]]
            ax.barh(range(top_n), top["bias_pct"], color=colors)
            ax.set_yticks(range(top_n))
            ax.set_yticklabels(top["bagf_name"], fontsize=9)
            ax.set_xlabel("Cover Bias (%)")
            ax.set_title("Per-Class Cover Bias (top classes by mean cover)")
            ax.axvline(x=0, color="black", linewidth=0.5)
            ax.invert_yaxis()
            plt.tight_layout()
        except Exception:
            plt.close(fig)
            raise
        out.figure(fig, "cover/per_class_bias.png")
    return out
