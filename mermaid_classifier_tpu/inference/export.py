"""export_artifact: serialize the calibrated head to a pickle-free npz,
parity-gate it against the source model, and write the generated manifest.

TPU-native analog of the reference's TorchScript freeze+gate flow
(reference: mermaid_classifier/pyspacer/inference/export.py:24-94); the
frozen-graph role is played by an npz params archive + the pure-jnp
``head_apply`` function, which together are the deployable artifact.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np

from mermaid_classifier_tpu.inference import (
    PARITY_PROVEN_JAX,
    SCHEMA_VERSION,
    TASK_NAME,
    JaxPinError,
    ParityError,
)
from mermaid_classifier_tpu.inference.head import HeadParams, make_head_fn


def _head_params_from_model(model: Any) -> HeadParams:
    """Extract MLP weights + per-class Platt params from a fitted
    CalibratedClassifier (training-side duck type).

    Contract (reference analog: inference/head.py:92-123):
    the model exposes ``classes_``, an ``estimator`` with ``coefs_`` /
    ``intercepts_`` (sklearn MLP naming: coefs_[i] is (in, out)), and
    ``calibration_a_`` / ``calibration_b_`` arrays in classes_ order.
    Only the multiclass (K > 2) path is supported — the binary case stores a
    single calibrator in sklearn-land and never ships in production.
    """
    estimator = getattr(model, "estimator", None)
    if estimator is None:
        raise ValueError("model has no .estimator; expected a fitted CalibratedClassifier.")
    n_classes = len(model.classes_)
    if n_classes <= 2:
        raise ValueError(
            f"export only supports the multiclass (K > 2) path; got K={n_classes}."
        )
    est_classes = np.asarray(estimator.classes_)
    if not np.array_equal(est_classes, np.asarray(model.classes_)):
        raise ValueError(
            "estimator.classes_ does not match model.classes_; calibrator"
            " column alignment is only valid when they are identical."
        )
    weights = [np.asarray(w, dtype=np.float32) for w in estimator.coefs_]
    biases = [np.asarray(v, dtype=np.float32) for v in estimator.intercepts_]
    temperature = getattr(model, "temperature_", None)
    if temperature is not None:
        # Temperature-calibrated model (train/calibration.py
        # TemperatureCalibratedClassifier): one scalar instead of (a, b).
        return HeadParams(weights, biases, temperature=float(temperature))
    a = np.asarray(model.calibration_a_, dtype=np.float32)
    b = np.asarray(model.calibration_b_, dtype=np.float32)
    if a.shape != (n_classes,) or b.shape != (n_classes,):
        raise ValueError(
            f"Expected {n_classes} per-class calibrators, got a.shape={a.shape},"
            f" b.shape={b.shape}."
        )
    return HeadParams(weights, biases, a, b)


def save_head_npz(path: Path, params: HeadParams) -> None:
    """Write the pickle-free params archive."""
    arrays: dict[str, np.ndarray] = {
        "n_layers": np.asarray(len(params.weights), dtype=np.int64),
    }
    if params.temperature is not None:
        arrays["cal_t"] = np.asarray(params.temperature, dtype=np.float64)
    else:
        arrays["cal_a"] = params.a
        arrays["cal_b"] = params.b
    for i, (w, v) in enumerate(zip(params.weights, params.biases)):
        arrays[f"W{i}"] = w
        arrays[f"b{i}"] = v
    np.savez(path, **arrays)


def export_artifact(
    model: Any,
    output_dir: str | Path,
    reference_features: Any,
    *,
    config: dict[str, Any] | None = None,
    task: str = TASK_NAME,
    tol: float = 1e-6,
    enforce_jax_pin: bool = True,
) -> tuple[Path, dict[str, Any], float]:
    """Turn a fitted calibrated classifier into the on-disk serving artifact.

    Writes model.npz (params archive) + model.json (manifest) under
    ``output_dir`` and returns (model_npz_path, manifest_dict, max_abs_diff).
    Two gates stand between a fitted model and a shipped artifact: the jax
    version pin (JaxPinError when the installed major.minor has not been
    parity-proven and enforce_jax_pin is True), and the numerical gate
    (ParityError when the serialized head and ``model.predict_proba``
    disagree by more than ``tol`` anywhere on the supplied feature batch).

    Same export contract as the reference (reference:
    inference/export.py:24-94); the provenance pin tracks jax instead of
    torch+sklearn because jax/XLA is what computes the shipped numbers here.
    """
    jax_mm = ".".join(jax.__version__.split(".")[:2])
    if enforce_jax_pin and jax_mm != PARITY_PROVEN_JAX:
        raise JaxPinError(
            f"installed jax is {jax.__version__} (major.minor {jax_mm});"
            f" parity has only been proven on {PARITY_PROVEN_JAX}. A jax/XLA"
            " upgrade can move compiled-head numerics, so exporting is"
            " blocked until parity is re-proven on real features and"
            " PARITY_PROVEN_JAX is bumped."
        )

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    params = _head_params_from_model(model)
    head_fn = make_head_fn(params)

    # Numerical gate: the artifact ships only if it reproduces the source
    # model on the supplied batch (reference: inference/export.py:59-69,
    # same 1e-6 tolerance). The batch is put on device ONCE and shared by
    # both forwards — uploading it twice cost ~30 s of a C2 drive through
    # a bad tunnel window (the bits are identical either way; the source
    # model's predict_proba takes the device fast path).
    import jax.numpy as jnp

    ref = jnp.asarray(np.asarray(reference_features, dtype=np.float32))
    expected = np.asarray(model.predict_proba(ref), dtype=np.float64)
    got = head_fn(ref)
    max_diff = float(np.max(np.abs(expected - got)))
    if max_diff > tol:
        raise ParityError(
            f"serialized head diverges from the source model by"
            f" max|Δ|={max_diff:.3e} (> tol {tol:.3e}) on the reference"
            " batch; artifact not written."
        )

    manifest = {
        "schema_version": SCHEMA_VERSION,
        "task": task,
        "classes": [str(c) for c in np.asarray(model.classes_).tolist()],
        "input_dim": params.input_dim,
        # Additive field: absent in pre-temperature artifacts, which the
        # loader reads as "sigmoid". Cross-checked against the npz keys.
        "calibration": params.calibration,
        "config": config if config is not None else {"patch_size": 224},
        "trained_with": {
            # jax/numpy versions recorded without importing anything heavy;
            # the serving runtime validates schema_version at load.
            "jax": jax.__version__,
            "numpy": np.__version__,
        },
    }

    model_npz = output_dir / "model.npz"
    save_head_npz(model_npz, params)
    (output_dir / "model.json").write_text(json.dumps(manifest, indent=2))

    return model_npz, manifest, max_diff
