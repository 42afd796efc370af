"""Single-image classify + visualize: the serve-shape forward pass.

Capability-parity rebuild of the reference's annotation viewer
(reference: mermaid_classifier/pyspacer/annotation.py:80-519): resolve a
classifier artifact from a registry name / object-store URI / local dir,
extract features for the image's annotated points through the cached
backbone, classify all points in ONE batched predict_proba call, write
top-N predictions back to the points CSV, and render a marker overlay.

Images resolve through the injectable ImageFetcher (serve/image_sources.py):
local path, ``store://`` URI, or a CoralNet image ID with suffix-preserving
cache — the transport callable is swappable, so zero-egress environments
inject a fake while the production shape stays intact
(reference: annotation.py:201-212, :342-387).
"""

from __future__ import annotations

import json
import tempfile
from dataclasses import dataclass
from logging import getLogger
from pathlib import Path

import numpy as np
import pandas as pd

from mermaid_classifier_tpu.inference.loader import Predictor, load_predictor

logger = getLogger(__name__)

_ROW_ALIASES = ("row", "Row", "ROW")
_COL_ALIASES = ("col", "Col", "COL", "column", "Column")


def resolve_classifier_artifact(
    spec: str | Path,
    *,
    tracker_root: str | Path | None = None,
    store=None,
    cache_dir: str | Path | None = None,
) -> Path:
    """Resolve a classifier spec to a local artifact directory containing
    ``model.npz`` + ``model.json``.

    Accepted forms (reference: annotation.py:80-101):
    - a local directory path;
    - ``models:/<name>`` or ``models:/<name>/v<N>`` — the tracker's model
      registry (latest version when no v<N>);
    - ``store://<bucket>/<prefix>`` — an object-store directory, downloaded
      into ``cache_dir``.
    """
    spec = str(spec)
    if spec.startswith("models:/"):
        from mermaid_classifier_tpu.tracking.local_tracker import (
            LocalTracker,
            get_default_tracker,
        )

        tracker = (
            LocalTracker(tracker_root) if tracker_root else get_default_tracker()
        )
        parts = spec[len("models:/"):].strip("/").split("/")
        name = parts[0]
        if len(parts) > 1:
            version_dir = tracker.model_version(name, parts[1])
            if version_dir is None:
                raise FileNotFoundError(
                    f"registered model {name!r} has no version {parts[1]!r}"
                    f" under {tracker.root}."
                )
        else:
            version_dir = tracker.latest_model_version(name)
            if version_dir is None:
                raise FileNotFoundError(
                    f"no registered model named {name!r} under {tracker.root}."
                )
        return _validated_artifact_dir(version_dir)

    if spec.startswith("store://"):
        if store is None:
            from mermaid_classifier_tpu.data.store import get_default_store

            store = get_default_store()
        rest = spec[len("store://"):]
        bucket, _, prefix = rest.partition("/")
        prefix = prefix.rstrip("/")
        cache_dir = (
            Path(cache_dir) if cache_dir
            else Path(tempfile.mkdtemp(prefix="artifact_"))
        )
        for fname in ("model.npz", "model.json"):
            store.download(bucket, f"{prefix}/{fname}", cache_dir / fname)
        return _validated_artifact_dir(cache_dir)

    return _validated_artifact_dir(Path(spec))


def _validated_artifact_dir(path: Path) -> Path:
    if not path.is_dir():
        raise FileNotFoundError(f"artifact directory {path} does not exist.")
    for fname in ("model.npz", "model.json"):
        if not (path / fname).is_file():
            raise FileNotFoundError(
                f"artifact directory {path} is missing {fname}."
            )
    return path


def read_points_csv(path: str | Path) -> pd.DataFrame:
    """Read a points CSV with (row, col) columns under common aliases;
    returns a dataframe with canonical ``row``/``col`` int columns plus any
    other columns untouched (reference: annotation.py:189-199)."""
    df = pd.read_csv(path, keep_default_na=False)
    renames = {}
    for canonical, aliases in (("row", _ROW_ALIASES), ("col", _COL_ALIASES)):
        present = [a for a in aliases if a in df.columns]
        if not present:
            raise ValueError(
                f"points CSV {path} has no {canonical} column (aliases:"
                f" {aliases}); has {list(df.columns)}."
            )
        renames[present[0]] = canonical
    df = df.rename(columns=renames)
    df["row"] = df["row"].astype(int)
    df["col"] = df["col"].astype(int)
    return df


@dataclass
class PointPrediction:
    row: int
    col: int
    labels: list[str]
    scores: list[float]


class AnnotationRun:
    """Classify every annotated point of one image through the SHIPPED
    artifact, exactly as production serving would (reference:
    annotation.py:104-261)."""

    def __init__(
        self,
        image: str | int | Path,
        points_csv: str | Path,
        classifier: str | Path | Predictor,
        *,
        extractor=None,
        top_n: int = 3,
        tracker_root: str | Path | None = None,
        fetcher=None,
    ) -> None:
        self.image_spec = image
        self.points_csv = Path(points_csv)
        self.top_n = int(top_n)
        if fetcher is None:
            from mermaid_classifier_tpu.serve.image_sources import ImageFetcher

            fetcher = ImageFetcher()
        self.fetcher = fetcher
        if isinstance(classifier, Predictor):
            self.predictor = classifier
        else:
            artifact_dir = resolve_classifier_artifact(
                classifier, tracker_root=tracker_root
            )
            self.predictor = load_predictor(artifact_dir)
        if extractor is None:
            from mermaid_classifier_tpu.models.extractor import build_extractor

            extractor = build_extractor()
        self.extractor = extractor
        self.points = read_points_csv(points_csv)
        self.predictions: list[PointPrediction] | None = None

    # -- pipeline ------------------------------------------------------------

    def load_image(self) -> np.ndarray:
        return self.fetcher.fetch(self.image_spec)

    def run(self) -> list[PointPrediction]:
        """Feature-extract all points, classify them in one batch, rank
        top-N per point (reference: annotation.py:226-261)."""
        image = self.load_image()
        rowcols = self.points[["row", "col"]].to_numpy(dtype=np.int32)
        features = self.extractor.extract_features(image, rowcols)
        if features.shape[1] != self.predictor.input_dim:
            raise ValueError(
                f"extractor produced {features.shape[1]}-dim features but the"
                f" classifier expects {self.predictor.input_dim}."
            )
        proba = self.predictor.predict_proba(features.astype(np.float32))
        classes = np.asarray(self.predictor.classes_)
        order = np.argsort(-proba, axis=1)[:, : self.top_n]
        self.predictions = [
            PointPrediction(
                row=int(r),
                col=int(c),
                labels=[str(classes[j]) for j in order[i]],
                scores=[float(proba[i, j]) for j in order[i]],
            )
            for i, (r, c) in enumerate(rowcols)
        ]
        return self.predictions

    def write_predictions(self, output_csv: str | Path | None = None) -> Path:
        """Write the points CSV back with pred_i/score_i columns appended
        (reference: annotation.py:395-443)."""
        if self.predictions is None:
            self.run()
        out = self.points.copy()
        for i in range(self.top_n):
            out[f"pred_{i + 1}"] = [
                p.labels[i] if i < len(p.labels) else ""
                for p in self.predictions
            ]
            out[f"score_{i + 1}"] = [
                round(p.scores[i], 6) if i < len(p.scores) else ""
                for p in self.predictions
            ]
        output_csv = Path(output_csv) if output_csv else self.points_csv
        out.to_csv(output_csv, index=False)
        return output_csv

    def show(self, ax=None):
        """Render the image with grouped point markers labeled by top-1
        prediction + confidence (reference: annotation.py:445-519).
        Returns the matplotlib Figure."""
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        from mermaid_classifier_tpu.common.plots import (
            PointMarker,
            plot_point_markers,
        )

        if self.predictions is None:
            self.run()
        if ax is None:
            fig, ax = plt.subplots(figsize=(10, 8))
        else:
            fig = ax.figure
        ax.imshow(self.load_image())
        markers = [
            PointMarker(
                row=p.row,
                col=p.col,
                group=p.labels[0] if p.labels else "?",
                text=f"{p.scores[0]:.2f}" if p.scores else "",
            )
            for p in self.predictions
        ]
        plot_point_markers(ax, markers)
        ax.set_axis_off()
        return fig

    def summary(self) -> dict:
        if self.predictions is None:
            self.run()
        top1 = [p.labels[0] for p in self.predictions if p.labels]
        unique, counts = np.unique(top1, return_counts=True)
        return {
            "image": str(self.image_spec),
            "n_points": len(self.predictions),
            "label_counts": dict(
                sorted(zip(unique.tolist(), counts.tolist()),
                       key=lambda kv: -kv[1])
            ),
        }


def write_run_report(run: AnnotationRun, output_dir: str | Path) -> Path:
    """Convenience: predictions CSV + overlay PNG + JSON summary in one dir."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    run.write_predictions(output_dir / "predictions.csv")
    fig = run.show()
    fig.savefig(output_dir / "overlay.png", dpi=120, bbox_inches="tight")
    (output_dir / "summary.json").write_text(json.dumps(run.summary(), indent=2))
    return output_dir
