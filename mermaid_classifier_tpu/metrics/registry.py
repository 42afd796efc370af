"""Declarative, ordered registry of metric groups — adding a group is one
line here (reference: metrics/registry.py:31-62)."""

from __future__ import annotations

import dataclasses
import typing

from mermaid_classifier_tpu.metrics._context import MetricsContext
from mermaid_classifier_tpu.metrics._results import MetricGroupResult
from mermaid_classifier_tpu.metrics.calibration import compute_calibration
from mermaid_classifier_tpu.metrics.classification import (
    compute_balanced_accuracy_mcc,
    compute_confusion_matrices,
    compute_precision_recall_f1,
)
from mermaid_classifier_tpu.metrics.cover import compute_cover
from mermaid_classifier_tpu.metrics.per_source import compute_per_source
from mermaid_classifier_tpu.metrics.probability import compute_probability
from mermaid_classifier_tpu.metrics.ranking import compute_ranking
from mermaid_classifier_tpu.metrics.taxonomic import compute_taxonomic

MetricGroupFunc = typing.Callable[[MetricsContext], MetricGroupResult]


@dataclasses.dataclass(frozen=True)
class MetricGroupSpec:
    name: str
    func: MetricGroupFunc
    requires_dataset: bool = False
    requires_val_proba: bool = False


# Order is significant and preserved by the coordinator.
METRIC_GROUPS: list[MetricGroupSpec] = [
    MetricGroupSpec("confusion_matrices", compute_confusion_matrices),
    MetricGroupSpec("precision_recall_f1", compute_precision_recall_f1),
    MetricGroupSpec("balanced_accuracy_mcc", compute_balanced_accuracy_mcc),
    MetricGroupSpec("taxonomic", compute_taxonomic),
    MetricGroupSpec("calibration", compute_calibration),
    MetricGroupSpec("cover", compute_cover, requires_dataset=True),
    MetricGroupSpec("per_source", compute_per_source, requires_dataset=True),
    MetricGroupSpec("probability", compute_probability, requires_val_proba=True),
    MetricGroupSpec("ranking", compute_ranking, requires_val_proba=True),
]


def applicable_metric_groups(
    ctx: MetricsContext,
) -> list[tuple[str, MetricGroupFunc]]:
    """Ordered (name, func) for groups whose required inputs are present."""
    out: list[tuple[str, MetricGroupFunc]] = []
    for spec in METRIC_GROUPS:
        if spec.requires_dataset and ctx.dataset is None:
            continue
        if spec.requires_val_proba and ctx.val_proba is None:
            continue
        out.append((spec.name, spec.func))
    return out
