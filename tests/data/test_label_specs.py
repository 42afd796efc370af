"""Label spec tests: rollups and include/exclude filters applied in the
relational engine (reference analog: tests/pyspacer/ label-spec tests)."""

from io import StringIO

import pandas as pd
import pytest

from mermaid_classifier_tpu.common.relational import Database
from mermaid_classifier_tpu.data.label_specs import (
    CNSourceFilter,
    LabelFilter,
    LabelRollupSpec,
)


@pytest.fixture()
def db():
    d = Database()
    d.create_table_from_df(
        "annotations",
        pd.DataFrame(
            {
                "benthic_attribute_id": ["ba1", "ba1", "ba2", "ba3", "ba3"],
                "growth_form_id": ["gf1", "", "gf2", "", "gf1"],
                "point": [1, 2, 3, 4, 5],
            }
        ),
    )
    yield d
    d.close()


class TestLabelFilter:
    def test_accepts_bagf(self):
        f = LabelFilter(StringIO("ba_id,gf_id\nba1,gf1\nba2,\n"), inclusion=True)
        assert f.accepts_bagf("ba1::gf1")
        assert f.accepts_bagf("ba2::")
        assert not f.accepts_bagf("ba1::")
        assert not f.accepts_bagf(None)

        ex = LabelFilter(StringIO("ba_id,gf_id\nba1,gf1\n"), inclusion=False)
        assert not ex.accepts_bagf("ba1::gf1")
        assert ex.accepts_bagf("ba1::")
        assert ex.accepts_bagf(None)

    def test_empty_exclusion_accepts_all(self):
        f = LabelFilter(StringIO(""), inclusion=False)
        assert f.accepts_bagf("anything::")

    def test_filter_in_db_inclusion(self, db):
        f = LabelFilter(StringIO("ba_id,gf_id\nba1,gf1\nba3,\n"), inclusion=True)
        deleted = f.filter_in_db(db, "annotations")
        assert deleted == 3
        df = db.query_df("SELECT point FROM annotations ORDER BY point")
        assert list(df["point"]) == [1, 4]
        # scratch column removed
        assert "_bagf_combo" not in db.columns("annotations")

    def test_filter_in_db_exclusion(self, db):
        f = LabelFilter(StringIO("ba_id,gf_id\nba2,gf2\n"), inclusion=False)
        deleted = f.filter_in_db(db, "annotations")
        assert deleted == 1
        assert db.row_count("annotations") == 4


class TestLabelRollupSpec:
    def test_roll_up_lookup(self):
        spec = LabelRollupSpec(
            StringIO("from_ba_id,from_gf_id,to_ba_id,to_gf_id\nba1,gf1,baX,\n")
        )
        assert spec.roll_up("ba1::gf1") == "baX::"
        assert spec.roll_up("ba1::") == "ba1::"  # untouched
        assert spec.roll_up(None) is None

    def test_empty_spec_rolls_nothing(self, db):
        spec = LabelRollupSpec(StringIO(""))
        spec.roll_up_in_db(db, "annotations")
        df = db.query_df(
            "SELECT benthic_attribute_id, growth_form_id FROM annotations"
            " ORDER BY point"
        )
        assert list(df["benthic_attribute_id"]) == ["ba1", "ba1", "ba2", "ba3", "ba3"]

    def test_roll_up_in_db(self, db):
        spec = LabelRollupSpec(
            StringIO(
                "from_ba_id,from_gf_id,to_ba_id,to_gf_id\n"
                "ba1,gf1,baHard,gfX\n"
                "ba2,gf2,baHard,\n"
            )
        )
        spec.roll_up_in_db(db, "annotations")
        df = db.query_df(
            "SELECT benthic_attribute_id AS ba, growth_form_id AS gf, point"
            " FROM annotations ORDER BY point"
        )
        assert list(df["ba"]) == ["baHard", "ba1", "baHard", "ba3", "ba3"]
        assert list(df["gf"]) == ["gfX", "", "", "", "gf1"]
        assert "_bagf_combo" not in db.columns("annotations")

    def test_extra_csv_columns_ignored(self):
        spec = LabelRollupSpec(
            StringIO(
                "from_ba_id,from_gf_id,to_ba_id,to_gf_id,comment\n"
                "ba1,,ba2,,just a note\n"
            )
        )
        assert spec.roll_up("ba1::") == "ba2::"


class TestCNSourceFilter:
    def test_source_list(self):
        f = CNSourceFilter(StringIO("id\n123\n456\n"))
        assert f.source_id_list == ["123", "456"]
        assert not f.is_empty()
        assert CNSourceFilter(StringIO("")).is_empty()
