"""MetricsCoordinator: run all applicable metric groups and log to the
experiment tracker (reference: metrics/coordinator.py:26-108, with the local
tracker replacing MLflow)."""

from __future__ import annotations

import logging

import numpy as np

from mermaid_classifier_tpu.metrics._context import (
    MetricsContext,
    MetricsContextError,
)
from mermaid_classifier_tpu.metrics._results import MetricGroupResult
from mermaid_classifier_tpu.metrics._taxonomy_helpers import (
    build_ba_paths,
    build_ba_to_top,
)
from mermaid_classifier_tpu.metrics.registry import applicable_metric_groups
from mermaid_classifier_tpu.tracking.local_tracker import Run

logger = logging.getLogger(__name__)


class MetricsCoordinator:
    """Validates the context, pre-computes shared inputs, runs every
    applicable group with per-group exception isolation, and logs results."""

    def __init__(self, ctx: MetricsContext, run: Run):
        self.ctx = ctx
        self.run = run

    def compute_and_log_all(self) -> None:
        try:
            self.ctx.validate()
        except MetricsContextError:
            logger.warning(
                "Metrics skipped: context validation failed", exc_info=True
            )
            return

        classes = list(self.ctx.val_results.classes)
        self.ctx.ba_to_top = build_ba_to_top(classes, self.ctx.ba_library)
        self.ctx.ba_paths = build_ba_paths(classes, self.ctx.ba_library)

        if self.ctx.clf is not None and self.ctx.dataset is not None:
            self._precompute_probabilities()

        for name, func in applicable_metric_groups(self.ctx):
            try:
                self._log_result(func(self.ctx))
            except Exception:
                logger.warning("Metric group %r failed", name, exc_info=True)

    def _precompute_probabilities(self) -> None:
        """Stream the val set through the classifier ONCE and share the
        probability matrix across groups. Failure just gates out the groups
        that need it (reference: coordinator.py:59-82)."""
        try:
            assert self.ctx.dataset is not None
            all_proba = []
            all_gt: list = []
            for x, y in self.ctx.dataset.labels.val.load_data_in_batches(
                batch_size=5000
            ):
                all_proba.append(self.ctx.clf.predict_proba(x))
                all_gt.extend(y)
            self.ctx.val_proba = np.vstack(all_proba)
            self.ctx.val_gt_labels = all_gt
        except Exception:
            logger.warning(
                "Failed to pre-compute probability matrix; probability and"
                " ranking metrics will be skipped",
                exc_info=True,
            )

    def _log_result(self, result: MetricGroupResult) -> None:
        for scalar in result.scalars:
            # Run.log_metric skips NaN/Inf with a warning.
            self.run.log_metric(scalar.name, scalar.value)
        for df_result in result.dataframes:
            self.run.log_dataframe(
                df_result.df,
                df_result.artifact_path
                if df_result.artifact_path.endswith(".csv")
                else df_result.artifact_path + ".csv",
            )
        for dict_result in result.dicts:
            self.run.log_dict(dict_result.data, dict_result.artifact_path)
        for fig_result in result.figures:
            self.run.log_figure(fig_result.fig, fig_result.artifact_path)
