"""Bulk feature classification: extracted feature files -> predictions CSV.

The reference serves predictions either one image at a time (the
annotation viewer, reference: annotation.py:249-261) or through the full
training runner's evaluation flow. Production extraction, however, leaves
behind buckets of ``*.features.npz`` files — this module classifies them
in bulk through the one shipped artifact contract (``load_predictor``),
packing EVERY row across all input files into large fixed batches so the
calibrated head runs a handful of device dispatches instead of one per
file (the same cross-image packing discipline as
``FeatureExtractor.extract_features_many``).

Inputs per file:
- ``*.npz`` — the bucket format (``rowcols`` (P, 2) + ``features`` (P, D),
  data/features_io.py);
- ``*.npy`` — a bare (P, D) float matrix (row/col reported as -1).
"""

from __future__ import annotations

import csv
from dataclasses import dataclass
from pathlib import Path

import numpy as np


@dataclass(frozen=True)
class PredictionRow:
    """One point's top-N prediction."""

    source_file: str
    row: int
    col: int
    labels: tuple[str, ...]
    scores: tuple[float, ...]


def load_feature_matrix(path: str | Path) -> tuple[np.ndarray, np.ndarray]:
    """(rowcols (P, 2) int, features (P, D) float32) from .npz or .npy."""
    path = Path(path)
    if path.suffix == ".npy":
        features = np.asarray(np.load(path), dtype=np.float32)
        if features.ndim != 2:
            raise ValueError(
                f"{path}: expected a 2-D feature matrix, got {features.shape}"
            )
        rowcols = np.full((len(features), 2), -1, dtype=np.int64)
        return rowcols, features
    from mermaid_classifier_tpu.data.features_io import read_feature_file

    rowcols, features = read_feature_file(path)
    return np.asarray(rowcols), np.asarray(features, dtype=np.float32)


def predict_feature_files(
    predictor,
    paths: list[str | Path],
    *,
    top_n: int = 3,
    batch_size: int = 4096,
) -> list[PredictionRow]:
    """Classify every row of every file through ``predictor`` and return
    per-point top-N rows in input order. Rows are packed across files
    into ``batch_size`` batches before hitting the head."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    loaded = []
    for path in paths:
        rowcols, features = load_feature_matrix(path)
        loaded.append((str(path), rowcols, features))

    all_features = (
        np.concatenate([f for _, _, f in loaded])
        if loaded
        else np.zeros((0, 0), np.float32)
    )
    classes = np.asarray(predictor.classes)
    k = min(top_n, len(classes))

    probas = []
    for start in range(0, len(all_features), batch_size):
        probas.append(
            np.asarray(
                predictor.predict_proba(all_features[start : start + batch_size])
            )
        )
    proba = (
        np.concatenate(probas)
        if probas
        else np.zeros((0, len(classes)))
    )

    rows: list[PredictionRow] = []
    offset = 0
    for source_file, rowcols, features in loaded:
        for i in range(len(features)):
            p = proba[offset + i]
            order = np.argsort(p)[::-1][:k]
            rows.append(
                PredictionRow(
                    source_file=source_file,
                    row=int(rowcols[i, 0]),
                    col=int(rowcols[i, 1]),
                    labels=tuple(str(classes[j]) for j in order),
                    scores=tuple(float(p[j]) for j in order),
                )
            )
        offset += len(features)
    return rows


def write_predictions_csv(
    rows: list[PredictionRow], output: str | Path, *, top_n: int
) -> None:
    """``file,row,col,label_1,score_1,...,label_N,score_N`` (the viewer's
    top-N write-back shape, generalized across files)."""
    output = Path(output)
    output.parent.mkdir(parents=True, exist_ok=True)
    header = ["file", "row", "col"]
    for rank in range(1, top_n + 1):
        header += [f"label_{rank}", f"score_{rank}"]
    with output.open("w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(header)
        for r in rows:
            record = [r.source_file, r.row, r.col]
            for rank in range(top_n):
                if rank < len(r.labels):
                    record += [r.labels[rank], f"{r.scores[rank]:.6f}"]
                else:
                    record += ["", ""]
            writer.writerow(record)
