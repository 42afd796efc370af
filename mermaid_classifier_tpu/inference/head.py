"""CalibratedHead: a pure-jnp function reproducing the calibrated
predict_proba pipeline of the training-side CalibratedClassifier.

Pipeline (multiclass, K > 2) — semantics match the reference CalibratedHead
(reference: mermaid_classifier/pyspacer/inference/head.py:1-89):

  logits = MLP(features)                    # Linear -> ReLU -> ... -> Linear
  p      = softmax(logits)                  # MLPClassifier.predict_proba core
  c_k    = sigmoid(-(a_k * p_k + b_k))      # per-class Platt sigmoid
  proba  = c / c.sum(axis=1)                # row-normalize; uniform if sum == 0
  proba  = where(1 < proba <= 1+1e-5, 1.0)  # sklearn overshoot clip

Computed in float32 with HIGHEST matmul precision so the TPU MXU does not
drop to bfloat16 — the ~1e-7 residual vs the float64 training-side path is
expected and bounded by the export-time parity gate (tol 1e-6, reference:
inference/export.py:59-69).

This module imports only jax/numpy/stdlib ([inference] lane).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# sklearn's CalibratedClassifierCV clips proba values that overshoot 1.0 by
# float rounding (up to 1e-5) back to exactly 1.0; reproduced verbatim
# (reference: inference/head.py:85-89).
_OVERSHOOT_EPS = 1e-5


class HeadParams:
    """Validated parameter bundle for the calibrated head.

    weights[i] is (in_dim, out_dim) float32 (jax convention: x @ W + b).
    Calibration is one of two forms:

    - sigmoid (the parity default): a, b are (K,) float32 per-class Platt
      parameters. Mirrors the constructor validation of the reference
      CalibratedHead (reference: inference/head.py:30-64).
    - temperature (keyword-only ``temperature=T``, with a=b=None): a single
      positive scalar; the head renormalizes p^(1/T) from the softmax
      probabilities (numerically matching the training-side pipeline, see
      head_apply) and preserves the argmax of the uncalibrated model.
    """

    def __init__(
        self,
        weights: list[np.ndarray],
        biases: list[np.ndarray],
        a: np.ndarray | None = None,
        b: np.ndarray | None = None,
        *,
        temperature: float | None = None,
    ) -> None:
        if temperature is not None:
            if a is not None or b is not None:
                raise ValueError(
                    "Pass either per-class (a, b) Platt parameters or a"
                    " scalar temperature, not both."
                )
            temperature = float(temperature)
            if not np.isfinite(temperature) or temperature <= 0.0:
                raise ValueError(
                    f"temperature must be a positive finite float, got"
                    f" {temperature!r}."
                )
        else:
            if a is None or b is None:
                raise ValueError(
                    "Calibration is required: pass (a, b) Platt parameters"
                    " or temperature=T."
                )
            a = np.asarray(a, dtype=np.float32)
            b = np.asarray(b, dtype=np.float32)
            if a.ndim != 1 or b.ndim != 1:
                raise ValueError(
                    f"Calibration parameters a and b must be 1-D arrays; got"
                    f" a.shape={a.shape}, b.shape={b.shape}."
                )
            if a.shape != b.shape:
                raise ValueError(
                    f"Calibration parameters a and b must have the same shape; got"
                    f" a.shape={a.shape}, b.shape={b.shape}."
                )
        if len(weights) != len(biases):
            raise ValueError(
                f"weights and biases must have the same length; got"
                f" {len(weights)} weights and {len(biases)} biases."
            )
        if len(weights) == 0:
            raise ValueError("weights must contain at least one layer.")
        self.weights = [np.asarray(w, dtype=np.float32) for w in weights]
        self.biases = [np.asarray(v, dtype=np.float32) for v in biases]
        for i, (w, v) in enumerate(zip(self.weights, self.biases)):
            if w.ndim != 2:
                raise ValueError(f"weights[{i}] must be 2-D, got shape {w.shape}.")
            if v.ndim != 1 or v.shape[0] != w.shape[1]:
                raise ValueError(
                    f"biases[{i}] shape {v.shape} does not match weights[{i}]"
                    f" output dim {w.shape[1]}."
                )
            if i > 0 and w.shape[0] != self.weights[i - 1].shape[1]:
                raise ValueError(
                    f"weights[{i}] input dim {w.shape[0]} does not chain from"
                    f" weights[{i - 1}] output dim {self.weights[i - 1].shape[1]}."
                )
        if a is not None and self.weights[-1].shape[1] != a.shape[0]:
            raise ValueError(
                f"final layer outputs {self.weights[-1].shape[1]} classes but"
                f" calibration has {a.shape[0]} entries."
            )
        self.a = a
        self.b = b
        self.temperature = temperature
        self.n_classes = int(self.weights[-1].shape[1])
        self.input_dim = int(self.weights[0].shape[0])

    @property
    def calibration(self) -> str:
        return "temperature" if self.temperature is not None else "sigmoid"

    def as_pytree(self) -> dict:
        tree = {
            "weights": [jnp.asarray(w) for w in self.weights],
            "biases": [jnp.asarray(v) for v in self.biases],
        }
        if self.temperature is not None:
            # Ship the inverse so the head multiplies (one fused op).
            tree["inv_t"] = jnp.asarray(1.0 / self.temperature, jnp.float32)
        else:
            tree["a"] = jnp.asarray(self.a)
            tree["b"] = jnp.asarray(self.b)
        return tree


def head_apply(params: dict, features: jax.Array) -> jax.Array:
    """Pure calibrated-head forward: (N, D) float32 -> (N, K) float32.

    Traceable/jittable; used by the exported Predictor and reusable under
    vmap/shard_map for batched multi-chip serving.
    """
    x = features
    weights = params["weights"]
    biases = params["biases"]
    n = len(weights)
    for i in range(n):
        x = (
            jax.lax.dot_general(
                x,
                weights[i],
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            + biases[i]
        )
        if i < n - 1:
            x = jax.nn.relu(x)
    if "inv_t" in params:
        # Temperature calibration: p^(1/T) renormalized. Computed the way
        # the training-side TemperatureCalibratedClassifier computes it —
        # softmax first, then scale the LOG-probabilities — NOT as the
        # algebraically-equal softmax(logits / T): scaling raw logits
        # amplifies the f32 rounding of inv_t by the logit magnitude
        # (|logits| ~ 100 on a trained C2 head) and tripped the 1e-6
        # export parity gate at 1.17e-6 on a real drive. Via log-softmax
        # the two paths differ only by f32-vs-f64 rounding on O(1)
        # quantities. Underflowed probabilities give log(0) = -inf, which
        # softmax maps back to exactly 0 — no NaN (inv_t > 0 is
        # validated). Rows sum to 1 by construction: no fallback/clip.
        p = jax.nn.softmax(x, axis=1)
        return jax.nn.softmax(jnp.log(p) * params["inv_t"], axis=1)
    p = jax.nn.softmax(x, axis=1)
    c = jax.nn.sigmoid(-(params["a"] * p + params["b"]))
    denom = jnp.sum(c, axis=1, keepdims=True)
    # Avoid NaN poisoning: jnp.where evaluates both branches, so divide by a
    # safe denominator and select the uniform row where denom == 0 (sklearn's
    # edge-case fallback; reference: inference/head.py:78-84).
    nonzero = denom != 0
    safe_denom = jnp.where(nonzero, denom, jnp.ones_like(denom))
    n_classes = c.shape[1]
    uniform = jnp.full_like(c, 1.0 / float(n_classes))
    proba = jnp.where(nonzero, c / safe_denom, uniform)
    return jnp.where(
        (proba > 1.0) & (proba <= 1.0 + _OVERSHOOT_EPS),
        jnp.ones_like(proba),
        proba,
    )


@functools.lru_cache(maxsize=None)
def _jitted_head_apply():
    return jax.jit(head_apply)


def make_head_fn(params: HeadParams):
    """Bind params and return a (N, D) float32 ndarray -> (N, K) float64
    ndarray callable. The jit cache is shared across predictors."""
    pytree = params.as_pytree()
    jitted = _jitted_head_apply()

    def run(features: np.ndarray) -> np.ndarray:
        out = jitted(pytree, jnp.asarray(features, dtype=jnp.float32))
        return np.asarray(out).astype(np.float64)

    return run
