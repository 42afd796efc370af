"""Relational engine tests (reference analog: tests/common/ DuckDB-utils
tests)."""

import pandas as pd
import pytest

from mermaid_classifier_tpu.common.relational import Database


@pytest.fixture()
def db():
    d = Database()
    d.create_table_from_df(
        "t",
        pd.DataFrame(
            {
                "label": ["a", "b", "a", "c", "b", "a"],
                "value": [1, 2, 3, 4, 5, 6],
                "group_id": ["g1", "g1", "g2", "g2", "g2", "g3"],
            }
        ),
    )
    yield d
    d.close()


class TestBasics:
    def test_query_df(self, db):
        df = db.query_df("SELECT label, value FROM t ORDER BY value")
        assert list(df["value"]) == [1, 2, 3, 4, 5, 6]
        assert db.row_count("t") == 6
        assert db.table_exists("t") and not db.table_exists("nope")
        assert db.columns("t") == ["label", "value", "group_id"]

    def test_temp_table_dropped(self, db):
        with db.temp_table() as name:
            db.execute(f'CREATE TABLE "{name}" (x)')
            assert db.table_exists(name)
        assert not db.table_exists(name)
        # dropped even on exception
        with pytest.raises(RuntimeError):
            with db.temp_table() as name2:
                db.execute(f'CREATE TABLE "{name2}" (x)')
                raise RuntimeError
        assert not db.table_exists(name2)

    def test_parquet_roundtrip(self, db, tmp_path):
        path = str(tmp_path / "t.parquet")
        db.write_parquet("t", path)
        db.read_parquet(path, "t2")
        assert db.row_count("t2") == 6

    def test_identifier_validation(self, db):
        with pytest.raises(ValueError, match="identifier"):
            db.row_count("t; DROP TABLE t")


class TestColumnOps:
    def test_transform_column_distinct_mapping(self, db):
        calls = []

        def upper(v):
            calls.append(v)
            return v.upper()

        db.transform_column("t", "label", upper)
        df = db.query_df("SELECT DISTINCT label FROM t ORDER BY label")
        assert list(df["label"]) == ["A", "B", "C"]
        # fn ran once per DISTINCT value, not per row.
        assert sorted(calls) == ["a", "b", "c"]

    def test_add_column_from(self, db):
        db.add_column_from(
            "t", "combo", ["label", "group_id"], lambda l, g: f"{l}/{g}"
        )
        df = db.query_df("SELECT combo FROM t ORDER BY value")
        assert df["combo"][0] == "a/g1"
        assert df["combo"][5] == "a/g3"

    def test_filter_on_column(self, db):
        deleted = db.filter_on_column("t", "label", lambda v: v != "b")
        assert deleted == 2
        assert db.row_count("t") == 4
        assert db.filter_on_column("t", "label", lambda v: True) == 0

    def test_transform_handles_null(self, db):
        db.execute("INSERT INTO t VALUES (NULL, 7, 'g4')")
        db.transform_column("t", "label", lambda v: "was-null" if v is None else v)
        assert (
            db.scalar("SELECT label FROM t WHERE value = 7") == "was-null"
        )


class TestIteration:
    def test_iter_rows_chunked(self, db):
        rows = list(db.iter_rows("SELECT * FROM t ORDER BY value", chunk_size=2))
        assert len(rows) == 6
        assert rows[0] == {"label": "a", "value": 1, "group_id": "g1"}

    def test_grouped_rows(self, db):
        groups = list(db.grouped_rows("t", ["group_id"], chunk_size=2))
        assert [len(g) for g in groups] == [2, 3, 1]
        assert {g[0]["group_id"] for g in groups} == {"g1", "g2", "g3"}
        # every row in a group shares the key
        for g in groups:
            assert len({r["group_id"] for r in g}) == 1
