"""Config-generator tests (reference analog: test_generate_training_config.py)."""

import tempfile
import unittest
from pathlib import Path

import pandas as pd

from mermaid_classifier_tpu.config.generate import select_labels, write_config_dir
from mermaid_classifier_tpu.data.label_specs import LabelFilter, LabelRollupSpec
from tests.common.taxonomy_fixtures import make_ba_library, make_gf_library


def _counts():
    # acropora-tabulate is annotated but (with top_n=2) not selected; it
    # should roll up to acropora. macroalgae is annotated + selected.
    return pd.DataFrame(
        {
            "ba_id": ["ba-acro", "ba-acro", "ba-algae", "ba-acro-tab", "ba-porites"],
            "gf_id": ["gf-br", "", "", "", "gf-ma"],
            "count": [500, 200, 400, 50, 30],
        }
    )


class TestSelectLabels(unittest.TestCase):
    def test_top_n_and_rollup_to_ancestor(self):
        generated = select_labels(make_ba_library(), _counts(), top_n=2)
        included = set(generated.included["ba_id"])
        self.assertEqual(included, {"ba-acro", "ba-algae"})
        rollups = generated.rollups
        # acro-tab -> acro (nearest selected ancestor).
        row = rollups[rollups["from_ba_id"] == "ba-acro-tab"].iloc[0]
        self.assertEqual(row["to_ba_id"], "ba-acro")
        # porites has NO selected ancestor (hard-coral not selected) -> excluded.
        self.assertEqual(generated.excluded, ["ba-porites"])

    def test_excluded_names_skip_selection(self):
        generated = select_labels(
            make_ba_library(), _counts(), top_n=2,
            excluded_names={"Acropora"},
        )
        self.assertEqual(
            set(generated.included["ba_id"]), {"ba-algae", "ba-acro-tab"}
        )

    def test_gf_buckets(self):
        generated = select_labels(
            make_ba_library(), _counts(), top_n=2,
            gf_buckets={"Acropora": ["branching"]},
            gf_library=make_gf_library(),
        )
        bucket = generated.included[
            (generated.included.ba_id == "ba-acro")
            & (generated.included.gf_id == "gf-br")
        ]
        self.assertEqual(len(bucket), 1)

    def test_unknown_ba_raises(self):
        counts = _counts()
        counts.loc[0, "ba_id"] = "ba-nope"
        with self.assertRaisesRegex(ValueError, "unknown ba_ids"):
            select_labels(make_ba_library(), counts, top_n=2)


class TestWriteConfigDir(unittest.TestCase):
    def test_generated_csvs_parse_as_label_specs(self):
        """The generated CSVs must load through the SAME spec classes the
        dataset pipeline consumes — config generation and consumption can
        never drift apart."""
        generated = select_labels(make_ba_library(), _counts(), top_n=2)
        with tempfile.TemporaryDirectory() as td:
            out = write_config_dir(
                Path(td) / "config", generated, make_ba_library(),
                sources=["1", "2"],
            )
            self.assertTrue((out / "README.md").is_file())
            self.assertTrue((out / "training_config.yaml").is_file())
            self.assertEqual(
                len(pd.read_csv(out / "sources.csv")), 2
            )
            label_filter = LabelFilter(str(out / "included_labels.csv"))
            self.assertEqual(len(label_filter.bagf_set), 2)
            rollups = LabelRollupSpec(str(out / "rollups.csv"))
            self.assertGreaterEqual(len(rollups.lookup), 1)

    def test_yaml_loads_as_run_config(self):
        from mermaid_classifier_tpu.config.run_config import TrainingRunConfig

        generated = select_labels(make_ba_library(), _counts(), top_n=2)
        with tempfile.TemporaryDirectory() as td:
            out = write_config_dir(
                Path(td) / "config", generated, make_ba_library()
            )
            config = TrainingRunConfig.from_yaml_path(
                out / "training_config.yaml"
            )
            self.assertEqual(config.training.epochs, 40)
            self.assertEqual(config.dataset.subsample.min_per_class, 200)

    def test_resident_dtype_validated_at_load(self):
        """A bad resident_dtype fails at config parse, not after the
        multi-GB feature load."""
        from mermaid_classifier_tpu.config.run_config import TrainingConfig

        self.assertEqual(
            TrainingConfig(resident_dtype="bfloat16").resident_dtype,
            "bfloat16",
        )
        self.assertEqual(
            TrainingConfig(resident_dtype="int8").resident_dtype, "int8"
        )
        with self.assertRaises(ValueError):
            TrainingConfig(resident_dtype="float16")

    def test_calibration_backend_validated_at_load(self):
        from mermaid_classifier_tpu.config.run_config import TrainingConfig

        self.assertEqual(
            TrainingConfig(calibration_backend="device").calibration_backend,
            "device",
        )
        with self.assertRaises(ValueError):
            TrainingConfig(calibration_backend="torch")


class TestNoSilentLabelDrops(unittest.TestCase):
    """Every annotated (ba, gf) combo must end at an included label or be
    explicitly excluded (regression: GF'd combos of selected non-bucketed
    BAs used to fall through the inclusion filter silently)."""

    def test_every_annotated_combo_resolves(self):
        counts = _counts()
        generated = select_labels(make_ba_library(), counts, top_n=2)
        included = {
            (r.ba_id, r.gf_id) for r in generated.included.itertuples()
        }
        rollup_from = {
            (r.from_ba_id, r.from_gf_id): (r.to_ba_id, r.to_gf_id)
            for r in generated.rollups.itertuples()
        }
        excluded = set(generated.excluded)
        for row in counts.itertuples():
            combo = (row.ba_id, row.gf_id)
            if row.ba_id in excluded:
                continue
            target = rollup_from.get(combo, combo)
            self.assertIn(
                target, included,
                f"annotated combo {combo} resolves to {target}, which is"
                f" neither included nor excluded",
            )

    def test_selected_ba_gf_combo_rolls_to_bare_ba(self):
        # (ba-acro, gf-br) is annotated; ba-acro selected, no buckets.
        generated = select_labels(make_ba_library(), _counts(), top_n=2)
        rollups = generated.rollups
        row = rollups[
            (rollups.from_ba_id == "ba-acro") & (rollups.from_gf_id == "gf-br")
        ]
        self.assertEqual(len(row), 1)
        self.assertEqual(row.iloc[0]["to_ba_id"], "ba-acro")
        self.assertEqual(row.iloc[0]["to_gf_id"], "")


if __name__ == "__main__":
    unittest.main()
