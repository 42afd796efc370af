"""Typed result containers returned by metric groups
(reference: metrics/_results.py:10-49)."""

from __future__ import annotations

import dataclasses
from typing import Any


@dataclasses.dataclass
class ScalarMetric:
    name: str
    value: float


@dataclasses.dataclass
class FigureResult:
    fig: Any  # matplotlib Figure
    artifact_path: str


@dataclasses.dataclass
class DataFrameResult:
    df: Any  # pandas DataFrame
    artifact_path: str


@dataclasses.dataclass
class DictResult:
    data: dict[str, Any]
    artifact_path: str


@dataclasses.dataclass
class MetricGroupResult:
    scalars: list[ScalarMetric] = dataclasses.field(default_factory=list)
    figures: list[FigureResult] = dataclasses.field(default_factory=list)
    dataframes: list[DataFrameResult] = dataclasses.field(default_factory=list)
    dicts: list[DictResult] = dataclasses.field(default_factory=list)

    def extend(self, other: "MetricGroupResult") -> None:
        self.scalars.extend(other.scalars)
        self.figures.extend(other.figures)
        self.dataframes.extend(other.dataframes)
        self.dicts.extend(other.dicts)
