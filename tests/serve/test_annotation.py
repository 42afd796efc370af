"""Single-image annotation runner tests (reference analog: the annotation
viewer paths of tests/pyspacer/)."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from mermaid_classifier_tpu.inference import export_artifact
from mermaid_classifier_tpu.models.efficientnet import EfficientNetConfig
from mermaid_classifier_tpu.models.extractor import build_extractor
from mermaid_classifier_tpu.serve.annotation import (
    AnnotationRun,
    read_points_csv,
    resolve_classifier_artifact,
    write_run_report,
)
from mermaid_classifier_tpu.tracking.local_tracker import LocalTracker
from mermaid_classifier_tpu.train.calibration import CalibratedClassifier
from mermaid_classifier_tpu.train.mlp_classifier import MLPClassifier

TINY_CONFIG = EfficientNetConfig(
    stem_channels=8,
    stages=((1, 8, 1, 1, 3),),
    head_channels=16,
    feature_dim=16,
    patch_size=32,
)


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    """Train a tiny calibrated head on 16-dim features and export it."""
    rng = np.random.default_rng(0)
    n, d, k = 200, 16, 3
    centers = rng.normal(0, 3, size=(k, d))
    y_idx = rng.integers(0, k, n)
    X = (rng.normal(0, 1, size=(n, d)) + centers[y_idx]).astype(np.float32)
    labels = np.array([f"ba-{i}::" for i in range(k)])
    clf = MLPClassifier(hidden_layer_sizes=(8,), random_state=0)
    for _ in range(5):
        clf.partial_fit(X, labels[y_idx], classes=list(labels))
    model = CalibratedClassifier.fit_from_scores(clf, clf.predict_proba(X), labels[y_idx])
    out = tmp_path_factory.mktemp("artifact")
    export_artifact(model, out, X[:16])
    return out


@pytest.fixture()
def image_and_points(tmp_path):
    rng = np.random.default_rng(1)
    image = rng.integers(0, 256, size=(96, 128, 3), dtype=np.uint8)
    from PIL import Image

    image_path = tmp_path / "reef.png"
    Image.fromarray(image).save(image_path)
    points = pd.DataFrame({"Row": [10, 50, 80], "Column": [12, 64, 120]})
    points_path = tmp_path / "points.csv"
    points.to_csv(points_path, index=False)
    return image_path, points_path


class TestResolveArtifact:
    def test_local_dir(self, artifact_dir):
        assert resolve_classifier_artifact(artifact_dir) == artifact_dir

    def test_missing_dir_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            resolve_classifier_artifact(tmp_path / "nope")

    def test_registry_latest_and_pinned(self, artifact_dir, tmp_path):
        tracker = LocalTracker(tmp_path / "tracking")
        v1 = tracker.register_model(
            "reef-model",
            [artifact_dir / "model.npz", artifact_dir / "model.json"],
        )
        v2 = tracker.register_model(
            "reef-model",
            [artifact_dir / "model.npz", artifact_dir / "model.json"],
        )
        assert (
            resolve_classifier_artifact(
                "models:/reef-model", tracker_root=tmp_path / "tracking"
            )
            == v2
        )
        assert (
            resolve_classifier_artifact(
                "models:/reef-model/v1", tracker_root=tmp_path / "tracking"
            )
            == v1
        )
        with pytest.raises(FileNotFoundError):
            resolve_classifier_artifact(
                "models:/reef-model/v9", tracker_root=tmp_path / "tracking"
            )


class TestReadPointsCsv:
    def test_aliases(self, image_and_points):
        _, points_path = image_and_points
        df = read_points_csv(points_path)
        assert list(df.columns[:2]) == ["row", "col"]

    def test_missing_column_raises(self, tmp_path):
        p = tmp_path / "bad.csv"
        pd.DataFrame({"x": [1]}).to_csv(p, index=False)
        with pytest.raises(ValueError, match="no row column"):
            read_points_csv(p)


class TestAnnotationRun:
    def _run(self, image_and_points, artifact_dir):
        image_path, points_path = image_and_points
        extractor = build_extractor(config=TINY_CONFIG)
        return AnnotationRun(
            image_path, points_path, str(artifact_dir), extractor=extractor
        )

    def test_end_to_end(self, image_and_points, artifact_dir, tmp_path):
        run = self._run(image_and_points, artifact_dir)
        preds = run.run()
        assert len(preds) == 3
        for p in preds:
            assert len(p.labels) == 3
            assert all(0.0 <= s <= 1.0 for s in p.scores)
            assert p.scores == sorted(p.scores, reverse=True)

        out_csv = run.write_predictions(tmp_path / "preds.csv")
        back = pd.read_csv(out_csv)
        assert {"pred_1", "score_1", "pred_3", "score_3"} <= set(back.columns)
        assert len(back) == 3

    def test_report_bundle(self, image_and_points, artifact_dir, tmp_path):
        run = self._run(image_and_points, artifact_dir)
        out = write_run_report(run, tmp_path / "report")
        assert (out / "predictions.csv").is_file()
        assert (out / "overlay.png").is_file()
        summary = json.loads((out / "summary.json").read_text())
        assert summary["n_points"] == 3
        assert sum(summary["label_counts"].values()) == 3

    def test_feature_dim_mismatch_raises(self, image_and_points, artifact_dir):
        image_path, points_path = image_and_points
        wrong = build_extractor(
            config=EfficientNetConfig(
                stem_channels=8,
                stages=((1, 8, 1, 1, 3),),
                head_channels=16,
                feature_dim=8,
                patch_size=32,
            )
        )
        run = AnnotationRun(
            image_path, points_path, str(artifact_dir), extractor=wrong
        )
        with pytest.raises(ValueError, match="expects 16"):
            run.run()


class TestSanitizedRegistryNames:
    def test_pinned_version_of_sanitized_name(self, artifact_dir, tmp_path):
        tracker = LocalTracker(tmp_path / "tracking")
        tracker.register_model(
            "reef model 2024",
            [artifact_dir / "model.npz", artifact_dir / "model.json"],
        )
        resolved = resolve_classifier_artifact(
            "models:/reef model 2024/v1", tracker_root=tmp_path / "tracking"
        )
        assert (resolved / "model.npz").is_file()
