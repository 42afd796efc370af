"""Bulk feature classification: packed batches vs per-file prediction
(differential), CSV shape, CLI round trip."""

import csv
from pathlib import Path

import numpy as np
import pytest

from mermaid_classifier_tpu.data.features_io import write_feature_file
from mermaid_classifier_tpu.inference import export_artifact
from mermaid_classifier_tpu.inference.loader import load_predictor
from mermaid_classifier_tpu.serve.batch_predict import (
    load_feature_matrix,
    predict_feature_files,
    write_predictions_csv,
)
from mermaid_classifier_tpu.train.calibration import CalibratedClassifier
from mermaid_classifier_tpu.train.mlp_classifier import MLPClassifier

DIM, K = 16, 3


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    n = 200
    centers = rng.normal(0, 3, size=(K, DIM))
    y_idx = rng.integers(0, K, n)
    X = (rng.normal(0, 1, size=(n, DIM)) + centers[y_idx]).astype(np.float32)
    labels = np.array([f"ba-{i}::" for i in range(K)])
    clf = MLPClassifier(hidden_layer_sizes=(8,), random_state=0)
    for _ in range(5):
        clf.partial_fit(X, labels[y_idx], classes=list(labels))
    model = CalibratedClassifier.fit_from_scores(
        clf, clf.predict_proba(X), labels[y_idx]
    )
    out = tmp_path_factory.mktemp("artifact")
    export_artifact(model, out, X[:16])
    return out


@pytest.fixture()
def feature_files(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for i, n_points in enumerate((5, 1, 7)):
        rowcols = rng.integers(0, 100, size=(n_points, 2)).astype(np.int64)
        features = rng.normal(0, 2, size=(n_points, DIM)).astype(np.float32)
        p = tmp_path / f"i{i}.features.npz"
        write_feature_file(p, rowcols, features)
        paths.append(p)
    # A bare matrix too.
    bare = tmp_path / "extra.npy"
    np.save(bare, rng.normal(size=(4, DIM)).astype(np.float32))
    paths.append(bare)
    return paths


class TestBatchPredict:
    def test_packed_matches_per_file(self, artifact_dir, feature_files):
        """Cross-file packing must not change any prediction: the packed
        run equals per-file predict_proba row for row."""
        predictor = load_predictor(artifact_dir)
        rows = predict_feature_files(
            predictor, feature_files, top_n=K, batch_size=6
        )
        offset = 0
        for path in feature_files:
            _, features = load_feature_matrix(path)
            proba = predictor.predict_proba(features)
            for i in range(len(features)):
                r = rows[offset + i]
                assert r.source_file == str(path)
                order = np.argsort(proba[i])[::-1]
                assert list(r.labels) == [
                    predictor.classes[j] for j in order
                ]
                # Different batch shapes reorder float accumulation in the
                # jitted head; agreement is float32-rounding, not bitwise.
                np.testing.assert_allclose(
                    r.scores, proba[i][order], rtol=1e-5, atol=1e-7
                )
            offset += len(features)
        assert offset == len(rows) == 17

    def test_npy_rowcols_are_minus_one(self, artifact_dir, feature_files):
        predictor = load_predictor(artifact_dir)
        rows = predict_feature_files(predictor, [feature_files[-1]], top_n=1)
        assert all(r.row == -1 and r.col == -1 for r in rows)

    def test_csv_shape(self, artifact_dir, feature_files, tmp_path):
        predictor = load_predictor(artifact_dir)
        rows = predict_feature_files(predictor, feature_files[:1], top_n=2)
        out = tmp_path / "preds.csv"
        write_predictions_csv(rows, out, top_n=2)
        with out.open() as f:
            records = list(csv.reader(f))
        assert records[0] == [
            "file", "row", "col", "label_1", "score_1", "label_2", "score_2"
        ]
        assert len(records) == 6  # header + 5 points
        assert float(records[1][4]) >= float(records[1][6])  # ranked

    def test_top_n_validation(self, artifact_dir, feature_files):
        predictor = load_predictor(artifact_dir)
        with pytest.raises(ValueError, match="top_n"):
            predict_feature_files(predictor, feature_files, top_n=0)

    def test_bad_npy_shape_rejected(self, tmp_path):
        p = tmp_path / "bad.npy"
        np.save(p, np.zeros(7, np.float32))
        with pytest.raises(ValueError, match="2-D"):
            load_feature_matrix(p)


class TestCLI:
    def test_end_to_end(self, artifact_dir, feature_files, tmp_path):
        import scripts.predict_features as cli

        out = tmp_path / "p.csv"
        rc = cli.main(
            [
                "--classifier", str(artifact_dir),
                "--output", str(out),
                "--top-n", "2",
                *[str(p) for p in feature_files],
            ]
        )
        assert rc == 0
        lines = out.read_text().splitlines()
        assert len(lines) == 18  # header + 17 points

    def test_single_file_much_larger_than_batch(self, artifact_dir,
                                                tmp_path):
        """The deque-cursor drain (round-3 fix): one file many times the
        batch size streams through in O(n) and yields identical rows to a
        whole-file predict."""
        rng = np.random.default_rng(7)
        n = 53  # deliberately not a multiple of batch_size
        rowcols = rng.integers(0, 100, size=(n, 2)).astype(np.int64)
        features = rng.normal(0, 2, size=(n, DIM)).astype(np.float32)
        p = tmp_path / "big.features.npz"
        write_feature_file(p, rowcols, features)

        predictor = load_predictor(artifact_dir)
        rows = predict_feature_files(predictor, [p], top_n=1, batch_size=8)
        assert len(rows) == n
        proba = predictor.predict_proba(features)
        want = np.argmax(proba, axis=1)
        got = [predictor.classes.index(r.labels[0]) for r in rows]
        assert got == want.tolist()
        # row/col metadata stays aligned through every drain boundary.
        assert [(r.row, r.col) for r in rows] == [
            (int(a), int(b)) for a, b in rowcols
        ]

    def test_exact_batch_multiples_leave_no_leftovers(self, artifact_dir,
                                                      tmp_path):
        rng = np.random.default_rng(8)
        paths = []
        for i, n in enumerate((4, 4, 8)):  # totals 16 = 2 x batch_size 8
            rowcols = rng.integers(0, 100, size=(n, 2)).astype(np.int64)
            features = rng.normal(0, 2, size=(n, DIM)).astype(np.float32)
            p = tmp_path / f"m{i}.features.npz"
            write_feature_file(p, rowcols, features)
            paths.append(p)
        predictor = load_predictor(artifact_dir)
        rows = predict_feature_files(predictor, paths, top_n=1, batch_size=8)
        assert len(rows) == 16
        assert [r.source_file for r in rows] == (
            [str(paths[0])] * 4 + [str(paths[1])] * 4 + [str(paths[2])] * 8
        )

    def test_empty_file_among_inputs(self, artifact_dir, tmp_path):
        rng = np.random.default_rng(9)
        empty = tmp_path / "empty.features.npz"
        write_feature_file(
            empty,
            np.zeros((0, 2), np.int64),
            np.zeros((0, DIM), np.float32),
        )
        full = tmp_path / "full.features.npz"
        write_feature_file(
            full,
            rng.integers(0, 9, size=(3, 2)).astype(np.int64),
            rng.normal(size=(3, DIM)).astype(np.float32),
        )
        predictor = load_predictor(artifact_dir)
        rows = predict_feature_files(
            predictor, [empty, full, empty], top_n=1, batch_size=4
        )
        assert len(rows) == 3
        assert all(r.source_file == str(full) for r in rows)


class TestMeshServing:
    """The bulk classifier over a virtual 8-device mesh must agree with
    the single-device predictor row for row (including non-multiple batch
    sizes, which the sharded predictor pads internally)."""

    def test_sharded_predictor_matches_single_device(self, artifact_dir):
        from mermaid_classifier_tpu.parallel.mesh import make_mesh
        from mermaid_classifier_tpu.parallel.sharded_serve import (
            load_sharded_predictor,
        )

        rng = np.random.default_rng(11)
        X = rng.normal(0, 2, size=(37, DIM)).astype(np.float32)  # 37 % 8 != 0
        single = load_predictor(artifact_dir)
        sharded = load_sharded_predictor(artifact_dir, make_mesh(8))
        assert sharded.classes == single.classes
        np.testing.assert_allclose(
            sharded.predict_proba(X), single.predict_proba(X),
            rtol=1e-6, atol=1e-9,
        )

    def test_cli_mesh_flag(self, artifact_dir, feature_files, tmp_path):
        import scripts.predict_features as cli

        out = tmp_path / "preds.csv"
        rc = cli.main([
            "--classifier", str(artifact_dir),
            "--output", str(out),
            "--mesh-devices", "8",
            "--top-n", "1",
            *[str(p) for p in feature_files],
        ])
        assert rc == 0
        lines = out.read_text().splitlines()
        assert len(lines) == 1 + 17  # header + every point
