"""Post-training evaluation metrics: a declarative registry of metric groups
plus a coordinator that runs them and logs to the experiment tracker
(reference: mermaid_classifier/pyspacer/metrics/; SURVEY.md §2.1 metric rows).
"""

from mermaid_classifier_tpu.metrics._context import (  # noqa: F401
    MetricsContext,
    MetricsContextError,
)
from mermaid_classifier_tpu.metrics._results import (  # noqa: F401
    DataFrameResult,
    DictResult,
    FigureResult,
    MetricGroupResult,
    ScalarMetric,
)
from mermaid_classifier_tpu.metrics.coordinator import MetricsCoordinator  # noqa: F401
from mermaid_classifier_tpu.metrics.registry import (  # noqa: F401
    METRIC_GROUPS,
    applicable_metric_groups,
)
