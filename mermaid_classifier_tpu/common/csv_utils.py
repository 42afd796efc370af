"""CSV-defined config framework.

Template-method base for configs loaded from CSV files
(reference: mermaid_classifier/common/csv_utils.py:25-98): declared columns
with header aliases, blank cells preserved as empty strings (never NaN), and
a per-row hook subclasses implement.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import IO, Any, ClassVar

import pandas as pd


@dataclass(frozen=True)
class ColumnSpec:
    """One expected CSV column: canonical name plus accepted header aliases."""

    name: str
    aliases: tuple[str, ...] = ()
    required: bool = True

    def matches(self, header: str) -> bool:
        return header == self.name or header in self.aliases


def csv_to_dataframe(
    csv_file: str | IO[str], columns: tuple[ColumnSpec, ...]
) -> pd.DataFrame:
    """Read a CSV with the blank-cell policy (empty string, never NaN),
    rename alias headers to canonical names, and validate presence.

    An empty file yields an empty frame with all canonical columns, so specs
    constructed from empty CSVs behave as empty sets.
    """
    try:
        df = pd.read_csv(csv_file, dtype=str, keep_default_na=False)
    except pd.errors.EmptyDataError:
        df = pd.DataFrame({spec.name: [] for spec in columns})

    rename: dict[str, str] = {}
    for header in df.columns:
        for spec in columns:
            if spec.matches(header) and header != spec.name:
                rename[header] = spec.name
    if rename:
        df = df.rename(columns=rename)

    missing = [
        spec.name for spec in columns if spec.required and spec.name not in df.columns
    ]
    if missing:
        raise ValueError(
            f"CSV is missing required column(s) {missing};"
            f" found columns {list(df.columns)}."
        )
    for spec in columns:
        if spec.name not in df.columns:
            df[spec.name] = ""
    return df


@dataclass
class CsvSpec:
    """Base class: subclasses declare COLUMNS and implement handle_row."""

    COLUMNS: ClassVar[tuple[ColumnSpec, ...]] = ()
    dataframe: pd.DataFrame = field(init=False)

    def __init__(self, csv_file: str | IO[str]):
        self.dataframe = csv_to_dataframe(csv_file, self.COLUMNS)
        for row in self.dataframe.itertuples(index=False):
            self.handle_row(row._asdict())

    def handle_row(self, row: dict[str, Any]) -> None:
        """Per-row initialization hook; default does nothing."""

    def __len__(self) -> int:
        return len(self.dataframe)
