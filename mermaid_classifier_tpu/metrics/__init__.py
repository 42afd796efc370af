"""Post-training evaluation metrics: decorator-registered metric groups
plus a coordinator that runs them and logs to the experiment tracker
(reference: mermaid_classifier/pyspacer/metrics/; SURVEY.md §2.1 metric rows).
"""

from mermaid_classifier_tpu.metrics.context import (  # noqa: F401
    MetricsContext,
    MetricsContextError,
)
from mermaid_classifier_tpu.metrics.coordinator import MetricsCoordinator  # noqa: F401
from mermaid_classifier_tpu.metrics.groups import (  # noqa: F401
    REPORT_ORDER,
    MetricGroup,
    all_groups,
    metric_group,
    runnable_groups,
)
from mermaid_classifier_tpu.metrics.outputs import (  # noqa: F401
    Artifact,
    GroupOutput,
)
