"""Serving-side tools: artifact resolution and the single-image annotation
runner (reference analog: mermaid_classifier/pyspacer/annotation.py)."""

from mermaid_classifier_tpu.serve.annotation import (  # noqa: F401
    AnnotationRun,
    resolve_classifier_artifact,
)
