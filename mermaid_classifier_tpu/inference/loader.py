"""load_predictor: serve-time loader for the portable artifact, with loud
load-time validation of the params archive against its manifest.

Mirrors the reference loader contract
(reference: mermaid_classifier/pyspacer/inference/loader.py:16-75).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import numpy as np

from mermaid_classifier_tpu.inference import SCHEMA_VERSION, ManifestError
from mermaid_classifier_tpu.inference.head import HeadParams, make_head_fn


class Predictor:
    """A loaded classifier head: feature batch -> calibrated probabilities."""

    def __init__(self, head_fn: Any, classes: list[str], input_dim: int) -> None:
        self._head_fn = head_fn
        self.classes = classes
        self.input_dim = input_dim

    @property
    def classes_(self) -> list[str]:
        """Alias for ``classes`` so a Predictor is a drop-in for the
        training-side classifier in metrics code that reads ``clf.classes_``
        (reference: inference/loader.py:24-28)."""
        return self.classes

    def predict_proba(self, features: Any) -> np.ndarray:
        arr = np.asarray(features, dtype=np.float32)
        if arr.ndim != 2 or arr.shape[1] != self.input_dim:
            raise ValueError(f"features must be (N, {self.input_dim}); got {arr.shape}.")
        return self._head_fn(arr)


def _load_head_params(model_npz_path: str | Path) -> HeadParams:
    # allow_pickle=False is the pickle-free guarantee: the archive can only
    # contain plain arrays, never executable objects.
    with np.load(model_npz_path, allow_pickle=False) as archive:
        try:
            n_layers = int(archive["n_layers"])
            weights = [archive[f"W{i}"] for i in range(n_layers)]
            biases = [archive[f"b{i}"] for i in range(n_layers)]
            a = archive["cal_a"]
            b = archive["cal_b"]
        except KeyError as exc:
            raise ManifestError(f"model.npz is missing required array: {exc}") from exc
    try:
        return HeadParams(weights, biases, a, b)
    except ValueError as exc:
        raise ManifestError(f"model.npz contains inconsistent params: {exc}") from exc


def load_predictor(
    model_npz_path: str | Path, model_json_path: str | Path | None = None
) -> Predictor:
    """Load model.npz + model.json, validating compatibility loudly.

    Accepts either the two file paths, or a single artifact *directory*
    containing ``model.npz`` + ``model.json`` (the export_artifact layout).
    Raises ManifestError on schema-version, class-count, or input_dim
    mismatch rather than returning a silently-mispredicting predictor
    (reference: inference/loader.py:38-75).
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
            f"model.json schema_version={schema_version!r} is incompatible"
            f" with this loader (expects {SCHEMA_VERSION})."
        )

    classes = manifest["classes"]
    input_dim = int(manifest["input_dim"])

    params = _load_head_params(model_npz_path)
    head_fn = make_head_fn(params)

    # Validate the params against the manifest, then probe with a
    # (1, input_dim) batch so a latent shape error surfaces at load time,
    # not first prediction (reference: inference/loader.py:59-67).
    if params.input_dim != input_dim:
        raise ManifestError(
            f"params expect input_dim={params.input_dim} but model.json"
            f" declares {input_dim}."
        )
    try:
        probe = head_fn(np.zeros((1, input_dim), dtype=np.float32))
    except Exception as exc:  # noqa: BLE001 - re-raise loudly as ManifestError
        raise ManifestError(
            f"head rejects input_dim={input_dim} declared in model.json: {exc}"
        ) from exc

    if probe.shape[1] != len(classes):
        raise ManifestError(
            f"class-count mismatch: head outputs {probe.shape[1]} classes"
            f" but model.json declares {len(classes)}."
        )

    return Predictor(head_fn, list(classes), input_dim)
