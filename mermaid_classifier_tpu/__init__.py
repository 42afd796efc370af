"""mermaid_classifier_tpu: TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
MERMAID coral-reef point-classification pipeline.

Capability-parity rebuild of data-mermaid/mermaid-classifier (see SURVEY.md),
re-architected TPU-first rather than ported:

- feature extraction: Flax EfficientNet backbone fed by a Pallas patch
  crop/resize/normalize kernel, batched/sharded over a jax device mesh
  (reference: scripts/build_feature_bucket.py — per-image torch loop);
- classifier head: optax-trained MLP with sklearn-compatible semantics
  (reference: mermaid_classifier/pyspacer/torch_classifier.py);
- portable artifact: pickle-free npz params + JSON manifest behind the same
  export/load contracts and parity gates (reference:
  mermaid_classifier/pyspacer/inference/).

The load-bearing invariant preserved from the reference is the dependency
split: ``mermaid_classifier_tpu.inference`` imports only jax/numpy/stdlib
(reference: pyproject.toml:17-62, tests/pyspacer/test_inference_decoupling.py).
"""

__version__ = "0.1.0"
