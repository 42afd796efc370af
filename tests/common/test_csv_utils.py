"""CSV spec framework tests (reference analog: tests/common/)."""

from io import StringIO

import pytest

from mermaid_classifier_tpu.common.csv_utils import (
    ColumnSpec,
    CsvSpec,
    csv_to_dataframe,
)


class TwoColSpec(CsvSpec):
    COLUMNS = (
        ColumnSpec("name", aliases=("label", "Label Name")),
        ColumnSpec("value"),
        ColumnSpec("note", required=False),
    )

    def __init__(self, csv_file):
        self.seen = []
        super().__init__(csv_file)

    def handle_row(self, row):
        self.seen.append((row["name"], row["value"], row["note"]))


class TestCsvToDataframe:
    def test_blank_cells_are_empty_strings(self):
        df = csv_to_dataframe(
            StringIO("name,value\nx,\n,y\n"), TwoColSpec.COLUMNS
        )
        assert df["value"][0] == ""
        assert df["name"][1] == ""

    def test_alias_renamed(self):
        df = csv_to_dataframe(StringIO("label,value\nx,1\n"), TwoColSpec.COLUMNS)
        assert list(df["name"]) == ["x"]

    def test_missing_required_raises(self):
        with pytest.raises(ValueError, match="missing required"):
            csv_to_dataframe(StringIO("name\nx\n"), TwoColSpec.COLUMNS)

    def test_optional_column_filled_empty(self):
        df = csv_to_dataframe(StringIO("name,value\nx,1\n"), TwoColSpec.COLUMNS)
        assert list(df["note"]) == [""]

    def test_empty_file_gives_empty_spec(self):
        df = csv_to_dataframe(StringIO(""), TwoColSpec.COLUMNS)
        assert len(df) == 0
        assert set(c.name for c in TwoColSpec.COLUMNS) <= set(df.columns)


class TestCsvSpec:
    def test_per_row_hook(self):
        spec = TwoColSpec(StringIO("Label Name,value,note\na,1,hi\nb,2,\n"))
        assert spec.seen == [("a", "1", "hi"), ("b", "2", "")]
        assert len(spec) == 2

    def test_empty_spec(self):
        spec = TwoColSpec(StringIO(""))
        assert spec.seen == []
        assert len(spec) == 0
