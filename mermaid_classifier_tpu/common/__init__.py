"""Common utilities: taxonomy, CSV spec framework, relational helpers, plots
(reference layer L1: mermaid_classifier/common/)."""
