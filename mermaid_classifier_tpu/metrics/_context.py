"""Shared input context for all metric groups
(reference: metrics/_context.py:22-68)."""

from __future__ import annotations

import dataclasses
import typing

import numpy as np

from mermaid_classifier_tpu.data.results import ValResults

if typing.TYPE_CHECKING:
    from mermaid_classifier_tpu.common.taxonomy import (
        BenthicAttributeLibrary,
        GrowthFormLibrary,
    )
    from mermaid_classifier_tpu.data.dataset import TrainingDataset


class MetricsContextError(Exception):
    """Raised when MetricsContext validation fails."""


@dataclasses.dataclass
class MetricsContext:
    """Bundles every input any metric group needs; groups pick what they use."""

    val_results: ValResults
    ba_library: "BenthicAttributeLibrary"
    gf_library: "GrowthFormLibrary"
    format_func: typing.Callable[[float], float] = float
    dataset: "TrainingDataset | None" = None
    clf: typing.Any = None
    val_proba: np.ndarray | None = None
    val_gt_labels: list | None = None
    ba_to_top: dict[str, str] | None = None
    ba_paths: dict[str, list[str]] | None = None

    def validate(self) -> None:
        """Raise MetricsContextError for empty predictions, out-of-range
        class indices, unresolvable class IDs, or an unfitted clf."""
        if not self.val_results.gt or not self.val_results.est:
            raise MetricsContextError(
                "val_results has no predictions (gt or est is empty)"
            )
        num_classes = len(self.val_results.classes)
        for idx in set(self.val_results.gt) | set(self.val_results.est):
            if idx < 0 or idx >= num_classes:
                raise MetricsContextError(
                    f"Class index {idx} out of range for {num_classes} classes"
                )
        for class_id in self.val_results.classes:
            try:
                self.ba_library.bagf_id_to_name(class_id, self.gf_library)
            except Exception as e:
                raise MetricsContextError(
                    f"Class ID {class_id!r} not found in ba_library: {e}"
                ) from e
        if self.clf is not None and (
            not hasattr(self.clf, "classes_") or len(self.clf.classes_) == 0
        ):
            raise MetricsContextError("clf has no classes_ attribute or it is empty")
