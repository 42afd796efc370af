"""Artifact round-trip, parity-gate, and manifest-gate tests
(reference analog: tests/pyspacer/test_portable_artifact.py)."""

import json

import numpy as np
import pytest

from mermaid_classifier_tpu.inference import (
    SCHEMA_VERSION,
    JaxPinError,
    ManifestError,
    ParityError,
    export_artifact,
    load_predictor,
)
from mermaid_classifier_tpu.train.calibration import CalibratedClassifier
from mermaid_classifier_tpu.train.mlp_classifier import MLPClassifier


@pytest.fixture(scope="module")
def calibrated_model():
    """A real fitted MLPClassifier wrapped in CalibratedClassifier, built the
    same way the trainer does (reference analog:
    tests/pyspacer/_calibrated_model_fixture.py)."""
    rng = np.random.default_rng(0)
    n, d, k = 240, 24, 4
    centers = rng.normal(0, 3, size=(k, d))
    y_idx = rng.integers(0, k, n)
    X = (rng.normal(0, 1, size=(n, d)) + centers[y_idx]).astype(np.float32)
    labels = np.array([f"label_{i}" for i in range(k)])
    y = labels[y_idx]

    clf = MLPClassifier(hidden_layer_sizes=(16, 8), random_state=0)
    for _ in range(10):
        clf.partial_fit(X, y, classes=list(labels))
    preds = clf.predict_proba(X)
    model = CalibratedClassifier.fit_from_scores(clf, preds, y)
    return model, X


class TestExportLoadRoundTrip:
    def test_roundtrip_parity(self, calibrated_model, tmp_path):
        model, X = calibrated_model
        model_npz, manifest, max_diff = export_artifact(model, tmp_path, X[:32])
        assert max_diff <= 1e-6
        assert manifest["schema_version"] == SCHEMA_VERSION
        assert manifest["input_dim"] == X.shape[1]
        assert manifest["classes"] == [str(c) for c in model.classes_]

        predictor = load_predictor(model_npz, tmp_path / "model.json")
        got = predictor.predict_proba(X[:64])
        expected = model.predict_proba(X[:64])
        np.testing.assert_allclose(got, expected, atol=1e-6)
        assert got.dtype == np.float64
        assert predictor.classes_ == manifest["classes"]

    def test_artifact_is_pickle_free(self, calibrated_model, tmp_path):
        model, X = calibrated_model
        model_npz, _, _ = export_artifact(model, tmp_path, X[:8])
        # np.load with allow_pickle=False must succeed — the archive holds
        # only plain arrays, never serialized objects.
        with np.load(model_npz, allow_pickle=False) as archive:
            assert int(archive["n_layers"]) == 3
            assert archive["W0"].dtype == np.float32

    def test_parity_gate_failure_injection(self, calibrated_model, tmp_path):
        model, X = calibrated_model

        class Diverged:
            classes_ = model.classes_
            estimator = model.estimator
            calibration_a_ = model.calibration_a_
            calibration_b_ = model.calibration_b_

            def predict_proba(self, feats):
                return model.predict_proba(feats) + 1e-3

        with pytest.raises(ParityError, match="diverges"):
            export_artifact(Diverged(), tmp_path, X[:8])

    def test_jax_pin_gate(self, calibrated_model, tmp_path, monkeypatch):
        model, X = calibrated_model
        import mermaid_classifier_tpu.inference.export as export_mod

        monkeypatch.setattr(export_mod, "PARITY_PROVEN_JAX", "0.0")
        with pytest.raises(JaxPinError, match="parity has only been proven"):
            export_artifact(model, tmp_path, X[:8])
        # Escape hatch mirrors the reference's enforce flag.
        export_artifact(model, tmp_path, X[:8], enforce_jax_pin=False)

    def test_binary_model_rejected(self, tmp_path):
        rng = np.random.default_rng(1)
        X = rng.normal(size=(60, 8)).astype(np.float32)
        y = np.where(X[:, 0] > 0, "pos", "neg")
        clf = MLPClassifier(hidden_layer_sizes=(4,), random_state=0)
        clf.partial_fit(X, y, classes=["neg", "pos"])
        model = CalibratedClassifier.fit_from_scores(
            clf, clf.predict_proba(X)[:, 1:], y
        )
        with pytest.raises(ValueError, match="multiclass"):
            export_artifact(model, tmp_path, X[:8])


class TestManifestGates:
    @pytest.fixture()
    def exported(self, calibrated_model, tmp_path):
        model, X = calibrated_model
        model_npz, manifest, _ = export_artifact(model, tmp_path, X[:8])
        return model_npz, tmp_path / "model.json", manifest

    def test_schema_version_mismatch(self, exported):
        model_npz, json_path, manifest = exported
        manifest["schema_version"] = 999
        json_path.write_text(json.dumps(manifest))
        with pytest.raises(ManifestError, match="schema_version"):
            load_predictor(model_npz, json_path)

    def test_class_count_mismatch(self, exported):
        model_npz, json_path, manifest = exported
        manifest["classes"] = manifest["classes"][:-1]
        json_path.write_text(json.dumps(manifest))
        with pytest.raises(ManifestError, match="class-count"):
            load_predictor(model_npz, json_path)

    def test_input_dim_mismatch(self, exported):
        model_npz, json_path, manifest = exported
        manifest["input_dim"] = manifest["input_dim"] + 1
        json_path.write_text(json.dumps(manifest))
        with pytest.raises(ManifestError, match="input_dim"):
            load_predictor(model_npz, json_path)

    def test_corrupt_npz(self, exported, tmp_path):
        _, json_path, _ = exported
        bad = tmp_path / "bad.npz"
        np.savez(bad, n_layers=np.asarray(2), W0=np.zeros((4, 4), np.float32))
        with pytest.raises(ManifestError, match="missing required array"):
            load_predictor(bad, json_path)

    def test_predictor_input_validation(self, exported):
        model_npz, json_path, manifest = exported
        predictor = load_predictor(model_npz, json_path)
        with pytest.raises(ValueError, match="features must be"):
            predictor.predict_proba(np.zeros((3, manifest["input_dim"] + 2)))


@pytest.fixture(scope="module")
def temperature_model(calibrated_model):
    """The same fitted MLP wrapped in the temperature calibrator instead
    (train/calibration.py TemperatureCalibratedClassifier)."""
    from mermaid_classifier_tpu.train.calibration import (
        TemperatureCalibratedClassifier,
    )

    sigmoid_model, X = calibrated_model
    clf = sigmoid_model.estimator
    preds = clf.predict_proba(X)
    y = np.asarray(clf.classes_)[np.argmax(preds, axis=1)]
    model = TemperatureCalibratedClassifier.fit_from_scores(clf, preds, y)
    return model, X


class TestTemperatureArtifact:
    """The temperature calibration family round-trips through the SAME
    export gates and loader probes as the sigmoid default."""

    def test_roundtrip_parity(self, temperature_model, tmp_path):
        model, X = temperature_model
        model_npz, manifest, max_diff = export_artifact(model, tmp_path, X[:32])
        assert max_diff <= 1e-6
        assert manifest["calibration"] == "temperature"

        predictor = load_predictor(model_npz, tmp_path / "model.json")
        got = predictor.predict_proba(X[:64])
        expected = model.predict_proba(X[:64])
        np.testing.assert_allclose(got, expected, atol=1e-6)
        # softmax rows sum to one with no fallback/clip machinery.
        np.testing.assert_allclose(got.sum(axis=1), 1.0, atol=1e-6)

    def test_parity_gate_at_trained_logit_magnitude(
        self, temperature_model, tmp_path
    ):
        """Regression: a trained C2 head reaches |logits| ~ 100, and the
        head's original softmax(logits * f32(inv_t)) formulation amplified
        the f32 rounding of inv_t by that magnitude — a real drive tripped
        the 1e-6 export gate at 1.17e-6. The head must compute p^(1/T)
        from the log of the softmax probabilities (O(1) quantities), which
        keeps the gate residual magnitude-independent."""
        import jax.numpy as jnp

        model, X = temperature_model
        clf = model.estimator
        original = clf._params
        # Inflate the fitted weights 25x: logits in the +/- thousands.
        clf._params = {
            "W": [jnp.asarray(np.asarray(w) * 25.0) for w in original["W"]],
            "b": [jnp.asarray(np.asarray(b) * 25.0) for b in original["b"]],
        }
        try:
            from mermaid_classifier_tpu.train.calibration import (
                TemperatureCalibratedClassifier,
            )

            inflated = TemperatureCalibratedClassifier(clf, 1.37)
            _, _, max_diff = export_artifact(inflated, tmp_path, X[:32])
            assert max_diff <= 1e-6
        finally:
            # The module-scoped fixture shares this estimator: restore the
            # original params object (bit-identical, not w*25/25).
            clf._params = original

    def test_argmax_matches_uncalibrated_estimator(
        self, temperature_model, tmp_path
    ):
        model, X = temperature_model
        model_npz, _, _ = export_artifact(model, tmp_path, X[:8])
        predictor = load_predictor(model_npz, tmp_path / "model.json")
        np.testing.assert_array_equal(
            np.argmax(predictor.predict_proba(X), axis=1),
            np.argmax(model.estimator.predict_proba(X), axis=1),
        )

    def test_npz_carries_cal_t_not_ab(self, temperature_model, tmp_path):
        model, X = temperature_model
        model_npz, _, _ = export_artifact(model, tmp_path, X[:8])
        with np.load(model_npz, allow_pickle=False) as archive:
            assert "cal_t" in archive
            assert float(archive["cal_t"]) == pytest.approx(
                model.temperature_
            )
            assert "cal_a" not in archive and "cal_b" not in archive

    def test_calibration_kind_cross_check(self, temperature_model, tmp_path):
        # model.json says sigmoid, model.npz carries cal_t -> refused.
        model, X = temperature_model
        model_npz, manifest, _ = export_artifact(model, tmp_path, X[:8])
        manifest["calibration"] = "sigmoid"
        (tmp_path / "model.json").write_text(json.dumps(manifest))
        with pytest.raises(ManifestError, match="calibration"):
            load_predictor(model_npz, tmp_path / "model.json")

    def test_legacy_manifest_without_field_reads_sigmoid(
        self, calibrated_model, tmp_path
    ):
        # Pre-temperature artifacts omit the manifest field entirely; the
        # loader must keep reading them as sigmoid.
        model, X = calibrated_model
        model_npz, manifest, _ = export_artifact(model, tmp_path, X[:8])
        del manifest["calibration"]
        (tmp_path / "model.json").write_text(json.dumps(manifest))
        predictor = load_predictor(model_npz, tmp_path / "model.json")
        np.testing.assert_allclose(
            predictor.predict_proba(X[:16]),
            model.predict_proba(X[:16]),
            atol=1e-6,
        )


class TestManifestProvenanceAndAliases:
    """Manifest provenance + metrics-facing aliases (reference analog:
    test_portable_artifact.py:100-160)."""

    def test_manifest_records_jax_provenance(self, calibrated_model, tmp_path):
        import jax

        model, X = calibrated_model
        _, manifest, _ = export_artifact(model, tmp_path, X[:16])
        trained_with = manifest["trained_with"]
        assert trained_with["jax"] == jax.__version__
        assert "numpy" in trained_with
        # The on-disk manifest carries the same provenance.
        disk = json.loads((tmp_path / "model.json").read_text())
        assert disk["trained_with"] == trained_with

    def test_predictor_exposes_classes_alias_for_metrics(
        self, calibrated_model, tmp_path
    ):
        model, X = calibrated_model
        export_artifact(model, tmp_path / "a", X[:16])
        predictor = load_predictor(tmp_path / "a")
        # Evaluation code written against a fitted classifier must run
        # unchanged against the shipped artifact.
        assert list(predictor.classes_) == list(predictor.classes)
        assert list(predictor.classes_) == [
            str(c) for c in model.classes_
        ]


LIVE_MODEL = "PORTABLE_ARTIFACT_LIVE_MODEL"
LIVE_FEATURES = "PORTABLE_ARTIFACT_LIVE_FEATURES"


class TestLiveModelParity:
    """Opt-in live gate (reference analog: test_portable_artifact.py:
    162-203): point the env vars at a REAL artifact directory and a real
    (N, input_dim) .npy feature matrix (built by
    scripts/extract_reference_features.py) and the parity contract is
    re-proven on production data. Skipped by default — CI stays
    synthetic/offline."""

    def test_live_artifact_serves_real_features(self):
        import os

        model_dir = os.environ.get(LIVE_MODEL)
        features_path = os.environ.get(LIVE_FEATURES)
        if not model_dir or not features_path:
            pytest.skip(
                f"set {LIVE_MODEL} and {LIVE_FEATURES} to run the live gate"
            )
        predictor = load_predictor(model_dir)
        features = np.load(features_path).astype(np.float32)
        assert features.ndim == 2
        assert features.shape[1] == predictor.input_dim
        proba = predictor.predict_proba(features)
        assert proba.shape == (len(features), len(predictor.classes))
        np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-6)
        assert float(proba.min()) >= 0.0 and float(proba.max()) <= 1.0
