"""Release flow tests (reference analog: test_release_artifact.py)."""

import numpy as np
import pytest

from mermaid_classifier_tpu.data.store import LocalFSObjectStore
from mermaid_classifier_tpu.inference import export_artifact
from mermaid_classifier_tpu.serve.release import (
    ReleaseError,
    release_artifact,
    validate_artifact,
    validate_version,
)
from mermaid_classifier_tpu.train.calibration import CalibratedClassifier
from mermaid_classifier_tpu.train.mlp_classifier import MLPClassifier

BUCKET = "release-bucket"


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    n, d, k = 150, 12, 3
    centers = rng.normal(0, 3, size=(k, d))
    y_idx = rng.integers(0, k, n)
    X = (rng.normal(0, 1, size=(n, d)) + centers[y_idx]).astype(np.float32)
    labels = np.array([f"ba-{i}::" for i in range(k)])
    clf = MLPClassifier(hidden_layer_sizes=(8,), random_state=0)
    for _ in range(4):
        clf.partial_fit(X, labels[y_idx], classes=list(labels))
    model = CalibratedClassifier.fit_from_scores(
        clf, clf.predict_proba(X), labels[y_idx]
    )
    out = tmp_path_factory.mktemp("artifact")
    export_artifact(model, out, X[:16])
    return out


@pytest.fixture()
def store(tmp_path):
    return LocalFSObjectStore(tmp_path / "store")


class TestValidation:
    def test_version_regex(self):
        validate_version("v1")
        validate_version("v42")
        for bad in ("1", "v1.2", "release-1", "v", "V3"):
            with pytest.raises(ReleaseError):
                validate_version(bad)

    def test_validate_artifact_ok(self, artifact_dir):
        manifest = validate_artifact(artifact_dir)
        assert manifest["classes"] == ["ba-0::", "ba-1::", "ba-2::"]

    def test_tampered_manifest_rejected(self, artifact_dir, tmp_path):
        import json
        import shutil

        bad = tmp_path / "bad"
        shutil.copytree(artifact_dir, bad)
        manifest = json.loads((bad / "model.json").read_text())
        del manifest["trained_with"]
        (bad / "model.json").write_text(json.dumps(manifest))
        with pytest.raises(ReleaseError, match="provenance"):
            validate_artifact(bad)


class TestRelease:
    def test_publish_and_immutability(self, store, artifact_dir):
        written = release_artifact(store, BUCKET, "v1", artifact_dir)
        assert sorted(written) == [
            "classifier/v1/model.json",
            "classifier/v1/model.npz",
        ]
        assert store.exists(BUCKET, "classifier/v1/model.npz")
        with pytest.raises(ReleaseError, match="immutable"):
            release_artifact(store, BUCKET, "v1", artifact_dir)
        # A different version is fine.
        release_artifact(store, BUCKET, "v2", artifact_dir)

    @staticmethod
    def _fidelity_record(path, weights_file, **overrides):
        """A runbook-shaped record for `weights_file` (sha matches)."""
        import hashlib
        import json

        record = {
            "all_green": True,
            "feature_mae": 2.1e-5,
            "feature_tol": 1e-4,
            "weights_sha256": hashlib.sha256(
                weights_file.read_bytes()
            ).hexdigest(),
            "padding": "tf_same",
            **overrides,
        }
        path.write_text(json.dumps(record))
        return path

    def test_backbone_extra_file_requires_fidelity_record(
        self, store, artifact_dir, tmp_path, caplog
    ):
        """Shipping backbone weights without the runbook's fidelity record
        is refused before any byte is written; a matching record unblocks;
        allow_unverified_backbone downgrades to a loud warning."""
        extra = tmp_path / "efficientnet_weights.npz"
        extra.write_bytes(b"weights")
        with pytest.raises(ReleaseError, match="fidelity"):
            release_artifact(
                store, BUCKET, "v1", artifact_dir, extra_files=[extra]
            )
        assert list(store.list_keys(BUCKET, prefix="classifier/")) == []

        record = self._fidelity_record(tmp_path / "fidelity.json", extra)
        written = release_artifact(
            store, BUCKET, "v1", artifact_dir, extra_files=[extra],
            fidelity_record=record,
        )
        assert "classifier/v1/efficientnet_weights.npz" in written

        # Emergency override publishes WITHOUT a record, but warns loudly.
        import logging

        with caplog.at_level(
            logging.WARNING, logger="mermaid_classifier_tpu.serve.release"
        ):
            release_artifact(
                store, BUCKET, "v2", artifact_dir, extra_files=[extra],
                allow_unverified_backbone=True,
            )
        assert any("UNVERIFIED" in r.getMessage() for r in caplog.records)

    def test_fidelity_record_gates(self, store, artifact_dir, tmp_path):
        """A record for DIFFERENT weights, a failed diff, or an
        out-of-tolerance MAE are each refused."""
        extra = tmp_path / "efficientnet_weights.npz"
        extra.write_bytes(b"weights")

        other = tmp_path / "other.npz"
        other.write_bytes(b"different weights")
        mismatched = self._fidelity_record(tmp_path / "r1.json", other)
        with pytest.raises(ReleaseError, match="sha256 mismatch"):
            release_artifact(
                store, BUCKET, "v1", artifact_dir, extra_files=[extra],
                fidelity_record=mismatched,
            )

        failed = self._fidelity_record(
            tmp_path / "r2.json", extra, all_green=False
        )
        with pytest.raises(ReleaseError, match="FAILED"):
            release_artifact(
                store, BUCKET, "v1", artifact_dir, extra_files=[extra],
                fidelity_record=failed,
            )

        out_of_tol = self._fidelity_record(
            tmp_path / "r3.json", extra, feature_mae=2e-4
        )
        with pytest.raises(ReleaseError, match="tolerance"):
            release_artifact(
                store, BUCKET, "v1", artifact_dir, extra_files=[extra],
                fidelity_record=out_of_tol,
            )

        # The config sidecar alone (no npz) needs no record.
        sidecar = tmp_path / "backbone.config.json"
        sidecar.write_text("{}")
        release_artifact(
            store, BUCKET, "v1", artifact_dir, extra_files=[sidecar]
        )

    def test_missing_extra_file_refused_before_write(self, store, artifact_dir):
        with pytest.raises(ReleaseError, match="does not exist"):
            release_artifact(
                store, BUCKET, "v1", artifact_dir,
                extra_files=["/nope/missing.npz"],
            )
        assert list(store.list_keys(BUCKET, prefix="classifier/")) == []

    def test_rollback_on_failure(self, store, artifact_dir, monkeypatch):
        calls = {"n": 0}
        real_put = store.put_bytes

        def failing_put(bucket, key, data):
            calls["n"] += 1
            if calls["n"] == 2:
                raise OSError("disk full")
            real_put(bucket, key, data)

        monkeypatch.setattr(store, "put_bytes", failing_put)
        with pytest.raises(OSError):
            release_artifact(store, BUCKET, "v1", artifact_dir)
        assert list(store.list_keys(BUCKET, prefix="classifier/")) == []


class TestVersionPrefixIsolation:
    def test_v1_not_blocked_by_v12(self, store, artifact_dir):
        release_artifact(store, BUCKET, "v12", artifact_dir)
        written = release_artifact(store, BUCKET, "v1", artifact_dir)
        assert "classifier/v1/model.npz" in written
        with pytest.raises(ReleaseError, match="immutable"):
            release_artifact(store, BUCKET, "v12", artifact_dir)
