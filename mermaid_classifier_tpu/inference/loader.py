"""Serve-time loading of the shipped artifact.

``load_predictor`` reads the params archive (model.npz) and the manifest
(model.json), cross-checks the two, and probes the assembled head before
handing anything back. Every check that could fail at prediction time is
forced to fail here instead — a predictor that loads is a predictor that
answers correctly shaped queries. (Capability parity with the reference
loader, reference: mermaid_classifier/pyspacer/inference/loader.py:16-75,
which plays the same gates against a TorchScript graph.)
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import numpy as np

from mermaid_classifier_tpu.inference import SCHEMA_VERSION, ManifestError
from mermaid_classifier_tpu.inference.head import HeadParams, make_head_fn


class Predictor:
    """The loaded serving head: batches of feature vectors in, calibrated
    per-class probabilities out."""

    def __init__(
        self,
        head_fn: Any,
        classes: list[str],
        input_dim: int,
        head_params: "HeadParams | None" = None,
    ) -> None:
        self._head_fn = head_fn
        self.classes = classes
        self.input_dim = input_dim
        # The already-gate-validated parameters, exposed so alternative
        # execution engines (e.g. parallel.sharded_serve) can re-wrap the
        # SAME params without re-reading the npz through loader internals.
        self.head_params = head_params

    @property
    def classes_(self) -> list[str]:
        """sklearn-style spelling of ``classes``, letting evaluation code
        that was written against a fitted classifier run unchanged against
        the shipped artifact."""
        return self.classes

    def predict_proba(self, features: Any) -> np.ndarray:
        arr = np.asarray(features, dtype=np.float32)
        if arr.ndim != 2 or arr.shape[1] != self.input_dim:
            raise ValueError(
                f"features must be a 2-D batch of width {self.input_dim};"
                f" got shape {arr.shape}."
            )
        return self._head_fn(arr)


def _load_head_params(model_npz_path: str | Path) -> HeadParams:
    # allow_pickle=False is the pickle-free guarantee: the archive can only
    # contain plain arrays, never executable objects.
    with np.load(model_npz_path, allow_pickle=False) as archive:
        try:
            n_layers = int(archive["n_layers"])
            weights = [archive[f"W{i}"] for i in range(n_layers)]
            biases = [archive[f"b{i}"] for i in range(n_layers)]
            if "cal_t" in archive:
                temperature = float(archive["cal_t"])
                a = b = None
            else:
                temperature = None
                a = archive["cal_a"]
                b = archive["cal_b"]
        except KeyError as exc:
            raise ManifestError(f"model.npz is missing required array: {exc}") from exc
    try:
        return HeadParams(weights, biases, a, b, temperature=temperature)
    except ValueError as exc:
        raise ManifestError(f"model.npz contains inconsistent params: {exc}") from exc


def load_predictor(
    model_npz_path: str | Path, model_json_path: str | Path | None = None
) -> Predictor:
    """Assemble a Predictor from model.npz + model.json, gating hard on any
    inconsistency between the two.

    Accepts either the pair of file paths or a single artifact *directory*
    holding both files (the layout export_artifact writes). The gates, in
    order: manifest schema_version must equal this loader's; the archive's
    input width must equal the manifest's ``input_dim``; a zero-batch probe
    through the head must succeed; the probe's class count must equal the
    manifest's. Any violation raises ManifestError before a Predictor
    exists — a mismatched artifact never gets the chance to mispredict.
    """
    if model_json_path is None:
        artifact_dir = Path(model_npz_path)
        if not artifact_dir.is_dir():
            raise ManifestError(
                f"load_predictor got a single argument {artifact_dir} that is"
                " not an artifact directory; pass (model.npz, model.json)"
                " paths or a directory containing both."
            )
        return load_predictor(
            artifact_dir / "model.npz", artifact_dir / "model.json"
        )
    manifest = json.loads(Path(model_json_path).read_text())

    schema_version = manifest.get("schema_version")
    if schema_version != SCHEMA_VERSION:
        raise ManifestError(
            f"model.json declares schema_version={schema_version!r}; this"
            f" loader reads version {SCHEMA_VERSION} artifacts only."
        )

    classes = manifest["classes"]
    input_dim = int(manifest["input_dim"])

    params = _load_head_params(model_npz_path)

    # Calibration-kind cross-check: the manifest field is additive —
    # pre-temperature artifacts omit it, which reads as "sigmoid".
    declared_cal = manifest.get("calibration", "sigmoid")
    if declared_cal != params.calibration:
        raise ManifestError(
            f"model.json declares calibration={declared_cal!r} but model.npz"
            f" carries {params.calibration!r} parameters."
        )

    head_fn = make_head_fn(params)

    # Cross-check archive against manifest, then push a zero batch through
    # the head so any latent assembly error surfaces now, not at the first
    # real prediction.
    if params.input_dim != input_dim:
        raise ManifestError(
            f"params expect input_dim={params.input_dim} but model.json"
            f" declares {input_dim}."
        )
    try:
        probe = head_fn(np.zeros((1, input_dim), dtype=np.float32))
    except Exception as exc:  # noqa: BLE001 - surface as a load-time gate
        raise ManifestError(
            f"head cannot evaluate the input_dim={input_dim} probe batch"
            f" from model.json: {exc}"
        ) from exc

    if probe.shape[1] != len(classes):
        raise ManifestError(
            f"class-count mismatch: the head emits {probe.shape[1]}"
            f" probabilities per row, the manifest lists {len(classes)}"
            f" classes."
        )

    return Predictor(head_fn, list(classes), input_dim, head_params=params)
