"""Source-ID CSV parsing for the extraction CLI: column auto-detect,
explicit override, normalization, order-preserving dedup — the reference's
launcher input contract (reference: scripts/build_feature_bucket.py:
218-260, tests/pyspacer/test_build_feature_bucket.py:85-123)."""

import argparse

import pytest

import scripts.build_feature_bucket as cli


def resolve(tmp_path, text, column=None):
    p = tmp_path / "sources.csv"
    p.write_text(text)
    args = argparse.Namespace(
        source_ids=None, source_ids_csv=str(p), source_id_column=column
    )
    return cli.parse_source_ids(args)


class TestSourceIdsCsv:
    def test_source_id_column(self, tmp_path):
        assert resolve(tmp_path, "source_id,n\n3,9\n1,2\n") == ["3", "1"]

    def test_source_id_with_space(self, tmp_path):
        assert resolve(tmp_path, "source id,n\n7,0\n") == ["7"]

    def test_single_column_fallback(self, tmp_path):
        assert resolve(tmp_path, "whatever\n12\n8\n") == ["12", "8"]

    def test_missing_column_raises(self, tmp_path):
        with pytest.raises(ValueError, match="source-id column"):
            resolve(tmp_path, "a,b\n1,2\n")

    def test_explicit_override(self, tmp_path):
        assert resolve(tmp_path, "a,b\n1,2\n", column="b") == ["2"]

    def test_override_missing_raises(self, tmp_path):
        with pytest.raises(ValueError, match="source-id-column"):
            resolve(tmp_path, "a,b\n1,2\n", column="c")

    def test_float_formatted_ids_normalize(self, tmp_path):
        assert resolve(tmp_path, "id\n123.0\n45\n") == ["123", "45"]

    def test_blanks_dropped(self, tmp_path):
        assert resolve(tmp_path, "id\n5\n\n  \n6\n") == ["5", "6"]

    def test_na_like_ids_are_real_ids_not_sentinels(self, tmp_path):
        # 'NA' (North Atlantic), 'null', 'None' are legitimate opaque IDs;
        # pandas default NA handling must never silently drop them.
        assert resolve(tmp_path, "id\nNA\nnull\nNone\n") == [
            "NA", "null", "None"
        ]

    def test_only_the_float_artifact_is_rewritten(self, tmp_path):
        # Zero-padded, scientific-looking, fractional, and inf-like IDs
        # pass through untouched — normalization targets ONLY the pandas
        # float64-column artifact ('<digits>.0').
        assert resolve(tmp_path, "id\n007\n5e2\n123.5\ninf\n") == [
            "007", "5e2", "123.5", "inf"
        ]

    def test_comma_list_gets_same_normalization(self, tmp_path):
        args = argparse.Namespace(
            source_ids="123.0,123, 123 ,007",
            source_ids_csv=None, source_id_column=None,
        )
        assert cli.parse_source_ids(args) == ["123", "007"]

    def test_duplicates_dropped_preserve_order(self, tmp_path):
        assert resolve(tmp_path, "id\n4\n2\n4\n2\n9\n") == ["4", "2", "9"]

    def test_non_numeric_ids_pass_through(self, tmp_path):
        assert resolve(tmp_path, "id\nreef-a\nreef-b\n") == [
            "reef-a", "reef-b"
        ]
