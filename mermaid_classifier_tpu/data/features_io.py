"""Per-image feature-vector file IO.

The reference stores one pyspacer ``.featurevector`` file per image (JSON of
per-point vectors; reference: scripts/extract_reference_features.py:1-60,
dataset.py:615-697). The TPU-native format is a compact npz per image:

- ``rowcols``  — (P, 2) int32, the annotated (row, col) point centers;
- ``features`` — (P, D) float32, one feature vector per point.

Written atomically (tmp + rename) so interrupted extraction runs never leave
half files — the idempotent-resume discipline of the reference bucket builder
(reference: scripts/build_feature_bucket.py:15-22).

A tolerant reader for the reference's legacy JSON featurevector layout is
provided for migration/parity fixtures.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

import numpy as np

FEATURE_FILE_SUFFIX = ".features.npz"


def write_feature_file(
    path: str | Path, rowcols: np.ndarray, features: np.ndarray
) -> None:
    """Atomically write one image's point features."""
    rowcols = np.asarray(rowcols, dtype=np.int32)
    features = np.asarray(features, dtype=np.float32)
    if rowcols.ndim != 2 or rowcols.shape[1] != 2:
        raise ValueError(f"rowcols must be (P, 2), got {rowcols.shape}")
    if features.ndim != 2 or features.shape[0] != rowcols.shape[0]:
        raise ValueError(
            f"features must be (P, D) matching rowcols; got {features.shape}"
            f" vs {rowcols.shape}"
        )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".part")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, rowcols=rowcols, features=features)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def read_feature_file(path: str | Path) -> tuple[np.ndarray, np.ndarray]:
    """Read (rowcols (P,2) int32, features (P,D) float32); pickle-free."""
    with np.load(path, allow_pickle=False) as archive:
        return (
            np.asarray(archive["rowcols"], dtype=np.int32),
            np.asarray(archive["features"], dtype=np.float32),
        )


def read_legacy_featurevector_json(path: str | Path) -> tuple[np.ndarray, np.ndarray]:
    """Read a pyspacer-style JSON featurevector file: a dict with
    ``point_features`` entries carrying row/col/data per point."""
    payload = json.loads(Path(path).read_text())
    points = payload["point_features"] if isinstance(payload, dict) else payload
    rowcols = np.asarray(
        [(int(p["row"]), int(p["col"])) for p in points], dtype=np.int32
    )
    features = np.asarray([p["data"] for p in points], dtype=np.float32)
    return rowcols, features


def select_point_features(
    rowcols: np.ndarray,
    features: np.ndarray,
    wanted_rowcols: list[tuple[int, int]],
) -> np.ndarray:
    """Select feature rows for specific (row, col) points, in the wanted
    order. Raises KeyError on a point missing from the file — a silent skip
    would misalign features and labels."""
    index = {(int(r), int(c)): i for i, (r, c) in enumerate(rowcols)}
    try:
        rows = [index[(int(r), int(c))] for r, c in wanted_rowcols]
    except KeyError as exc:
        raise KeyError(
            f"point {exc.args[0]} not present in feature file"
            f" (has {len(index)} points)."
        ) from None
    return features[rows]
