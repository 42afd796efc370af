"""TrainingDataset pipeline integration tests (reference analog:
tests/pyspacer/test_training_dataset_pipeline.py and test_train.py)."""

from io import StringIO

import pytest

from mermaid_classifier_tpu.config.options import DatasetOptions
from mermaid_classifier_tpu.config.settings import override_settings
from mermaid_classifier_tpu.data.dataset import TrainingDataset
from mermaid_classifier_tpu.data.subsample import SubsampleOptions

from tests.data.dataset_fixtures import BUCKET, build_environment, patch_taxonomy


@pytest.fixture()
def env(tmp_path, monkeypatch):
    store, manifest_path, mermaid_path = build_environment(tmp_path)
    patch_taxonomy(monkeypatch)
    with override_settings(
        coralnet_train_data_bucket=BUCKET,
        mermaid_train_data_bucket=BUCKET,
        mermaid_annotations_parquet_pattern=mermaid_path,
        feature_cache_dir=str(tmp_path / "feature_cache"),
    ):
        yield store, manifest_path, mermaid_path, tmp_path


def make_dataset(env, **opt_kwargs):
    store, manifest_path, _, _ = env
    options = DatasetOptions(
        coralnet_manifest_uri=opt_kwargs.pop("coralnet_manifest_uri", manifest_path),
        **opt_kwargs,
    )
    return TrainingDataset(options, store=store)


class TestFullPipeline:
    def test_end_to_end(self, env):
        ds = make_dataset(env)
        stats = ds.artifacts.train_summary_stats
        # 2 sources x 4 images x 12 points minus unmapped, plus 6x12 MERMAID.
        assert stats["annotations"] > 100
        assert stats["annotations_train"] > 0
        assert stats["annotations_ref"] > 0
        assert stats["annotations_val"] > 0
        assert (
            stats["annotations_train"]
            + stats["annotations_ref"]
            + stats["annotations_val"]
            + stats["annotations_dropped"]
            == stats["annotations"]
        )
        # Split tags present in the table (LEFT JOIN kept all rows).
        tagged = ds.db.query_df(
            "SELECT training_set, count(*) AS n FROM annotations"
            " GROUP BY training_set"
        )
        assert set(tagged["training_set"]) >= {"train", "ref", "val"}
        # Unmapped CN labels recorded and dropped.
        assert "9999" in set(ds.artifacts.unmapped_labels["label_id"])
        remaining = ds.db.scalar(
            "SELECT count(*) FROM annotations WHERE label_id = '9999'"
        )
        assert remaining == 0
        # MERMAID 'None' growth forms normalized to ''.
        assert (
            ds.db.scalar(
                "SELECT count(*) FROM annotations WHERE growth_form_id = 'None'"
            )
            == 0
        )
        assert ds.coralnet_source_ids == ["1", "2"]
        assert "annotations" in ds.describe_train_summary_stats()
        assert len(ds.profiled_sections) >= 5
        # BA/BAGF count artifacts carry readable names.
        assert "benthic_attribute_name" in ds.artifacts.ba_counts.columns
        assert "growth_form_name" in ds.artifacts.bagf_counts.columns
        ds.cleanup()

    def test_coralnet_only_and_mermaid_only(self, env):
        ds_cn = make_dataset(env, include_mermaid=False)
        assert ds_cn.artifacts.mermaid_project_stats.empty
        assert ds_cn.artifacts.train_summary_stats["annotations"] > 0

        ds_m = make_dataset(env, coralnet_manifest_uri=None)
        assert ds_m.artifacts.coralnet_project_stats.empty
        sites = set(
            ds_m.db.query_df("SELECT DISTINCT site FROM annotations")["site"]
        )
        assert sites == {"mermaid"}

    def test_no_data_raises(self, env):
        with pytest.raises(ValueError, match="No annotations"):
            make_dataset(env, coralnet_manifest_uri=None, include_mermaid=False)

    def test_bad_manifest_raises(self, env, tmp_path):
        bad = tmp_path / "bad.parquet"
        bad.write_bytes(b"not a parquet")
        with pytest.raises(RuntimeError, match="manifest parquet"):
            make_dataset(env, coralnet_manifest_uri=str(bad))


class TestRollupAndFilter:
    def test_drop_growthforms(self, env):
        ds = make_dataset(env, drop_growthforms=True)
        gfs = set(
            ds.db.query_df("SELECT DISTINCT growth_form_id FROM annotations")[
                "growth_form_id"
            ]
        )
        assert gfs == {""}

    def test_rollup_spec(self, env, tmp_path):
        rollup_csv = tmp_path / "rollups.csv"
        rollup_csv.write_text(
            "from_ba_id,from_gf_id,to_ba_id,to_gf_id\nba-acro,gf-br,ba-hard,\n"
        )
        ds = make_dataset(env, label_rollup_spec_csv=str(rollup_csv))
        combos = set(
            ds.db.query_df(
                "SELECT DISTINCT benthic_attribute_id || '::' || growth_form_id"
                " AS c FROM annotations"
            )["c"]
        )
        assert "ba-acro::gf-br" not in combos
        assert "ba-hard::" in combos

    def test_included_labels_filter(self, env, tmp_path):
        include_csv = tmp_path / "included.csv"
        include_csv.write_text("ba_id,gf_id\nba-acro,gf-br\n")
        ds = make_dataset(env, included_labels_csv=str(include_csv))
        combos = set(
            ds.db.query_df(
                "SELECT DISTINCT benthic_attribute_id || '::' || growth_form_id"
                " AS c FROM annotations"
            )["c"]
        )
        assert combos == {"ba-acro::gf-br"}

    def test_both_filter_csvs_rejected(self, env, tmp_path):
        a = tmp_path / "a.csv"
        a.write_text("ba_id,gf_id\nba-acro,\n")
        with pytest.raises(ValueError, match="not both"):
            make_dataset(
                env, included_labels_csv=str(a), excluded_labels_csv=str(a)
            )


class TestSubsample:
    def test_subsample_deterministic_with_audit(self, env):
        opts = dict(
            subsample=SubsampleOptions(
                strategy="balanced", total_annotations=60, min_per_class=5
            )
        )
        ds1 = make_dataset(env, **opts)
        ds2 = make_dataset(env, **opts)
        rows1 = ds1.db.query_df(
            "SELECT site, project_id, image_id, row, col FROM annotations"
            " ORDER BY site, project_id, image_id, row, col"
        )
        rows2 = ds2.db.query_df(
            "SELECT site, project_id, image_id, row, col FROM annotations"
            " ORDER BY site, project_id, image_id, row, col"
        )
        assert rows1.equals(rows2)

        audit = ds1._subsample_audit_df
        assert audit is not None
        assert set(audit.columns) == {
            "benthic_attribute_id",
            "growth_form_id",
            "pre_count",
            "target_n",
            "realized_n",
        }
        # Realized = min(target, available): the min_per_class floor can
        # exceed a rare class's availability (allocators never oversample).
        import numpy as np

        expected_realized = np.minimum(audit["target_n"], audit["pre_count"])
        assert (audit["realized_n"] == expected_realized).all()
        assert ds1._subsample_realized_total == int(audit["realized_n"].sum())


class TestMissingFeatures:
    def test_zero_tolerance_aborts(self, tmp_path, monkeypatch):
        store, manifest_path, mermaid_path = build_environment(
            tmp_path, skip_feature_files=("s1/features/i1000.features.npz",)
        )
        patch_taxonomy(monkeypatch)
        with override_settings(
            coralnet_train_data_bucket=BUCKET,
            mermaid_train_data_bucket=BUCKET,
            mermaid_annotations_parquet_pattern=mermaid_path,
            feature_cache_dir=str(tmp_path / "cache"),
            training_inputs_percent_missing_allowed=0,
        ):
            with pytest.raises(RuntimeError, match="Too many feature vectors"):
                TrainingDataset(
                    DatasetOptions(coralnet_manifest_uri=manifest_path), store=store
                )

    def test_tolerance_drops_and_continues(self, tmp_path, monkeypatch):
        store, manifest_path, mermaid_path = build_environment(
            tmp_path, skip_feature_files=("s1/features/i1000.features.npz",)
        )
        patch_taxonomy(monkeypatch)
        with override_settings(
            coralnet_train_data_bucket=BUCKET,
            mermaid_train_data_bucket=BUCKET,
            mermaid_annotations_parquet_pattern=mermaid_path,
            feature_cache_dir=str(tmp_path / "cache"),
            training_inputs_percent_missing_allowed=20,
        ):
            ds = TrainingDataset(
                DatasetOptions(coralnet_manifest_uri=manifest_path), store=store
            )
            remaining = ds.db.scalar(
                "SELECT count(*) FROM annotations WHERE image_id = '1000'"
            )
            assert remaining == 0
            assert ds.artifacts.train_summary_stats["annotations"] > 0


class TestGetAnnotations:
    def test_log_specs(self, env):
        ds = make_dataset(env)
        assert len(ds.get_annotations("all")) == ds.db.row_count("annotations")
        s1 = ds.get_annotations("s1")
        assert set(s1["project_id"]) == {"1"}
        i1000 = ds.get_annotations("i1000")
        assert set(i1000["image_id"]) == {"1000"}
        with pytest.raises(ValueError, match="log spec"):
            ds.get_annotations("bogus")

    def test_project_stats_with_training_sets(self, env):
        ds = make_dataset(env)
        stats = ds.compute_project_stats(has_training_sets=True)
        assert {"train", "ref", "val", "dropped"} <= set(stats.columns)
        assert (
            stats[["train", "ref", "val", "dropped"]].sum(axis=1)
            == stats["num_annotations"]
        ).all()
