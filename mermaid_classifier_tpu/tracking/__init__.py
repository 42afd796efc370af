"""Experiment tracking: a local run-directory tracker with the MLflow-shaped
API surface the pipeline needs (reference dependency: mlflow; SURVEY.md §5.5).
"""

from mermaid_classifier_tpu.tracking.local_tracker import (  # noqa: F401
    LocalTracker,
    Run,
    get_default_tracker,
)
