"""Model definitions (Flax): EfficientNet backbone and feature extractor.

TPU compute path — replaces the reference's torch/TorchScript EfficientNet
dependency (reference: SURVEY.md §2.3, scripts/build_feature_bucket.py:375-448).
"""
