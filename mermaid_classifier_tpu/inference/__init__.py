"""Portable classifier artifact: pickle-free npz export + serve-time loader.

TPU-native equivalent of the reference's TorchScript artifact lane
(reference: mermaid_classifier/pyspacer/inference/__init__.py:1-52).
Modules in this subpackage import only jax / numpy / json / stdlib. They must
NOT import the training-only settings layer, flax/optax, pandas, or scipy, so
the [inference] dependency split holds (reference: pyproject.toml:17-62,
guarded here by tests/inference/test_inference_decoupling.py).

Artifact layout (replaces the reference's model.pt + model.json):

- ``model.npz``  — numpy archive loaded with ``allow_pickle=False``:
  ``n_layers`` (int), ``W{i}``/``b{i}`` per linear layer (W is (in, out)
  float32, jax convention), ``cal_a``/``cal_b`` per-class Platt params
  (float32, shape (K,)).
- ``model.json`` — manifest: schema_version / task / classes / input_dim /
  config / trained_with provenance.
"""

SCHEMA_VERSION = 1
TASK_NAME = "mermaid_mlp_classifier_tpu"

# The jax major.minor the npz/jnp parity gate was proven against.
# The calibrated-head math is plain jnp, but XLA codegen and default matmul
# precision can shift between releases, so a jax bump must not pass silently:
# export refuses to ship (JaxPinError) until parity is re-proven and this
# constant is updated. Analog of the reference's PARITY_PROVEN_SKLEARN
# (reference: inference/__init__.py:12-17).
PARITY_PROVEN_JAX = "0.9"


class ParityError(Exception):
    """Raised when the exported artifact's scores diverge from the source
    model beyond the parity tolerance — fails the export/build
    (reference: inference/__init__.py:20-22)."""


class ManifestError(Exception):
    """Raised at load time when model.json is incompatible with the params
    archive (schema version, class count, or input_dim mismatch)
    (reference: inference/__init__.py:25-27)."""


class JaxPinError(Exception):
    """Raised at export when the installed jax differs from
    PARITY_PROVEN_JAX — the version the parity gate was proven against
    (reference analog: SklearnPinError, inference/__init__.py:30-32)."""


from mermaid_classifier_tpu.inference.export import export_artifact  # noqa: E402
from mermaid_classifier_tpu.inference.loader import (  # noqa: E402
    Predictor,
    load_predictor,
)

__all__ = [
    "SCHEMA_VERSION",
    "TASK_NAME",
    "PARITY_PROVEN_JAX",
    "ParityError",
    "ManifestError",
    "JaxPinError",
    "export_artifact",
    "Predictor",
    "load_predictor",
]
