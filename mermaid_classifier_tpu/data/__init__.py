"""Data/ETL layer: feature files, point labels, splits, manifests, dataset.

Host-side work (reference: mermaid_classifier/pyspacer/dataset.py and the
pyspacer data classes it consumes). Training-lane only.
"""
