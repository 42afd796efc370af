"""Runner tests: base runner plumbing and the full tracking lifecycle with
eval-the-exported-artifact (reference analog: tests for runner.py)."""

import json

import numpy as np
import pytest

from mermaid_classifier_tpu.config.options import (
    DatasetOptions,
    TrackingOptions,
    TrainingOptions,
)
from mermaid_classifier_tpu.config.settings import override_settings
from mermaid_classifier_tpu.tracking.local_tracker import LocalTracker
from mermaid_classifier_tpu.train.class_weights import SampleWeightingOptions
from mermaid_classifier_tpu.train.mlp_classifier import MLPClassifier
from mermaid_classifier_tpu.train.runner import TrackingTrainingRunner, TrainingRunner
from mermaid_classifier_tpu.train.trainer import MermaidTrainer

from tests.common.taxonomy_fixtures import BA_RECORDS, GF_BY_ID, MAPPING_RECORDS
from tests.data.dataset_fixtures import BUCKET, build_environment


class SmallNetTrainerMixin:
    """Shrinks the production head so runner tests stay seconds-fast."""

    def _make_trainer(self, batch_size, class_weight):
        runner = self

        class SmallTrainer(MermaidTrainer):
            def _make_classifier(self, cw):
                return MLPClassifier(
                    hidden_layer_sizes=(16,),
                    learning_rate_init=1e-2,
                    class_weight=cw,
                    random_state=0,
                )

        return SmallTrainer(
            batch_size=batch_size,
            on_epoch_end=runner._on_epoch_end,
            class_weight=class_weight,
            early_stopping_patience=runner.training_options.early_stopping_patience,
        )


class SmallTrainingRunner(SmallNetTrainerMixin, TrainingRunner):
    pass


class SmallTrackingRunner(SmallNetTrainerMixin, TrackingTrainingRunner):
    pass


@pytest.fixture()
def env(tmp_path, monkeypatch):
    """Fixture store + parquets + offline taxonomy via the env var (so both
    the dataset and the runner resolve the same fixture libraries)."""
    from mermaid_classifier_tpu.common import taxonomy

    fixture_dir = tmp_path / "taxonomy"
    fixture_dir.mkdir()
    (fixture_dir / "benthic_attributes.json").write_text(json.dumps(BA_RECORDS))
    (fixture_dir / "growth_forms.json").write_text(json.dumps(GF_BY_ID))
    (fixture_dir / "label_mappings.json").write_text(json.dumps(MAPPING_RECORDS))
    monkeypatch.setenv(taxonomy.TAXONOMY_FIXTURE_ENV, str(fixture_dir))
    taxonomy.get_benthic_attribute_library.cache_clear()
    taxonomy.get_growth_form_library.cache_clear()
    taxonomy.get_coralnet_mapping.cache_clear()

    store, manifest_path, mermaid_path = build_environment(
        tmp_path, n_sources=2, images_per_source=5, points_per_image=15
    )
    with override_settings(
        coralnet_train_data_bucket=BUCKET,
        mermaid_train_data_bucket=BUCKET,
        mermaid_annotations_parquet_pattern=mermaid_path,
        feature_cache_dir=str(tmp_path / "cache"),
        batch_size=200,
    ):
        yield store, manifest_path, tmp_path
    taxonomy.get_benthic_attribute_library.cache_clear()
    taxonomy.get_growth_form_library.cache_clear()
    taxonomy.get_coralnet_mapping.cache_clear()


class TestBaseRunner:
    def test_run_without_tracking(self, env):
        store, manifest_path, _ = env
        runner = SmallTrainingRunner(
            dataset_options=DatasetOptions(coralnet_manifest_uri=manifest_path),
            training_options=TrainingOptions(epochs=2),
            store=store,
        )
        return_msg, clf_cal, val_results = runner.run()
        assert len(return_msg.ref_accs) == 2
        assert 0 <= return_msg.acc <= 1
        assert len(val_results.classes) >= 2

    def test_class_weights_flow_through(self, env):
        store, manifest_path, _ = env
        runner = SmallTrainingRunner(
            dataset_options=DatasetOptions(
                coralnet_manifest_uri=manifest_path,
                weighting=SampleWeightingOptions(enabled=True, weight_ratio_cap=100),
            ),
            training_options=TrainingOptions(epochs=1),
            store=store,
        )
        runner.run()
        assert runner._weighting_log["enabled"] is True
        per_class = runner._weighting_log["per_class_df"]
        assert (per_class["weight"] > 0).all()
        assert runner._weighting_log["summary"]["n_classes"] == len(per_class)


class TestTrackingRunner:
    def test_full_lifecycle(self, env):
        store, manifest_path, tmp_path = env
        tracker = LocalTracker(tmp_path / "tracking")
        runner = SmallTrackingRunner(
            dataset_options=DatasetOptions(coralnet_manifest_uri=manifest_path),
            training_options=TrainingOptions(epochs=3, early_stopping_patience=5),
            tracking_options=TrackingOptions(experiment_name="test-exp"),
            tracker=tracker,
            store=store,
        )
        return_msg, registered = runner.run()
        assert return_msg is not None
        assert registered is not None and registered.name == "v1"
        assert (registered / "model.npz").exists()
        assert (registered / "model.json").exists()

        runs = tracker.runs("test-exp")
        assert len(runs) == 1
        run = runs[0]

        params = run.params()
        assert params["epochs"] == 3
        assert params["subsample/enabled"] is False
        assert "system/platform" in params

        metrics = run.latest_metrics()
        # Per-epoch series + artifact-based metrics + parity + accuracy.
        for expected in (
            "epoch/ref_accuracy",
            "epoch/val_loss",
            "epoch/training_loss",
            "accuracy",
            "export_parity_max_abs_diff",
            "balanced_accuracy",
            "ece",
            "log_loss",
            "per_source/min_accuracy",
            "early_stop/final_epoch",
            "system/memory_used_percent",
        ):
            assert expected in metrics, f"missing {expected}"
        assert metrics["export_parity_max_abs_diff"] <= 1e-6
        assert len(run.metric_history("epoch/val_loss")) == 3

        artifacts = run.list_artifacts()
        for expected in (
            "dataset/ba_counts.csv",
            "dataset/bagf_counts.csv",
            "dataset/train_summary_stats.yaml",
            "profiled_sections.csv",
            "valresult.json",
            "annotations_val.csv",
            "epoch_ref_accuracies.yaml",
            "model/model.npz",
            "model/model.json",
            "early_stop_info.json",
        ):
            assert expected in artifacts, f"missing {expected} in {artifacts}"
        assert any(a.startswith("confusion_matrix/") for a in artifacts)

        # The stage decomposition is complete: the post-train blocks
        # (export gate, metrics) are profiled and land in the CSV, which
        # therefore must be written after them.
        sections_csv = run.run_dir / "artifacts" / "profiled_sections.csv"
        section_names = sections_csv.read_text()
        assert "Export and parity gate" in section_names
        assert "Metrics vs shipped artifact" in section_names

        # The registered artifact itself serves correctly.
        from mermaid_classifier_tpu.inference import load_predictor

        predictor = load_predictor(
            registered / "model.npz", registered / "model.json"
        )
        proba = predictor.predict_proba(
            np.zeros((2, 8), dtype=np.float32)
        )
        assert proba.shape[0] == 2

    def test_model_name_auto_and_truncation(self, env):
        store, manifest_path, tmp_path = env
        runner = SmallTrackingRunner(
            dataset_options=DatasetOptions(coralnet_manifest_uri=manifest_path),
            tracking_options=TrackingOptions(model_name="x" * 80),
            tracker=LocalTracker(tmp_path / "t2"),
            store=store,
        )
        assert len(runner._get_model_name()) == 50
        runner2 = SmallTrackingRunner(
            dataset_options=DatasetOptions(coralnet_manifest_uri=manifest_path),
            tracker=LocalTracker(tmp_path / "t3"),
            store=store,
        )
        name = runner2._get_model_name()
        assert name.startswith("mermaid-mlp") and "cn" in name

    def test_tracking_sync_bucket_mirrors_run(self, env):
        """With TRACKING_SYNC_BUCKET set, a finished run mirrors into the
        object store automatically (the tracking-server analog)."""
        store, manifest_path, tmp_path = env
        from mermaid_classifier_tpu.tracking.store_sync import list_remote_runs

        tracker = LocalTracker(tmp_path / "sync-tracking")
        with override_settings(
            object_store_root=str(store.root), tracking_sync_bucket="trk"
        ):
            runner = SmallTrackingRunner(
                dataset_options=DatasetOptions(coralnet_manifest_uri=manifest_path),
                training_options=TrainingOptions(epochs=1),
                tracking_options=TrackingOptions(experiment_name="sync-exp"),
                tracker=tracker,
                store=store,
            )
            runner.run()
        remote = list_remote_runs(store, "trk")
        assert "sync-exp" in remote and len(remote["sync-exp"]) == 1
        run_id = remote["sync-exp"][0]
        # Registry mirrored too.
        keys = list(store.list_keys("trk", prefix="tracking/_models/"))
        assert any(k.endswith("model.npz") for k in keys)
        # The run's metrics are readable remotely.
        from mermaid_classifier_tpu.tracking.store_sync import pull_run_from_store

        pulled = pull_run_from_store(
            store, "trk", "sync-exp", run_id, tmp_path / "pulled"
        )
        assert "accuracy" in pulled.latest_metrics()


class TestPackedCacheGating:
    """Device-resident runs must NOT build the packed feature cache: after
    the one-time upload nothing streams from disk, so packing would rewrite
    the whole corpus (train+ref+val) for zero benefit."""

    def test_resident_skips_packing_streamed_packs(self):
        with override_settings(use_packed_feature_cache=True):
            resident = TrainingRunner(
                training_options=TrainingOptions(device_resident=True)
            )._make_trainer(batch_size=100, class_weight=None)
            assert resident.packed_cache_dir is None

            streamed = TrainingRunner(
                training_options=TrainingOptions(device_resident=False)
            )._make_trainer(batch_size=100, class_weight=None)
            assert streamed.packed_cache_dir is not None

        with override_settings(use_packed_feature_cache=False):
            trainer = TrainingRunner(
                training_options=TrainingOptions(device_resident=False)
            )._make_trainer(batch_size=100, class_weight=None)
            assert trainer.packed_cache_dir is None
