"""Training lane: JAX/optax classifier head, calibration, trainer, runner.

Training-only — may import flax/optax/scipy/pandas. The serving lane lives in
``mermaid_classifier_tpu.inference`` and must stay import-decoupled from this
package (reference invariant: pyproject.toml:17-62).
"""
