"""What a metric group hands back to the coordinator.

A group produces two things: named scalar values, and a flat list of
artifacts to persist. Artifacts carry a ``kind`` tag ("figure", "table",
"mapping") instead of living in per-type lists, so logging sinks dispatch
on one field and a new artifact kind never grows the container type.

``GroupOutput`` is a builder — groups chain ``.scalar(...)``,
``.figure(...)``, ``.table(...)``, ``.mapping(...)`` as they compute.
(Capability parity with the reference's typed result containers,
reference: mermaid_classifier/pyspacer/metrics/_results.py; the shape
here is this framework's own.)
"""

from __future__ import annotations

from typing import Any, NamedTuple

FIGURE = "figure"
TABLE = "table"
MAPPING = "mapping"


class Artifact(NamedTuple):
    """One thing to persist: a matplotlib figure, a tabular frame, or a
    plain dict, with the artifact path it should land at.

    ``save_kwargs`` (figures only) forwards to ``fig.savefig`` and wins
    over the sink's defaults — the confusion-matrix group uses it to cap
    raster size and skip the tight-bbox measuring pass, which otherwise
    re-renders a 6,400-text canvas (measured 58 s -> ~20 s for the group
    at 80 classes; docs/perf_roofline.md)."""

    kind: str
    payload: Any
    path: str
    save_kwargs: dict | None = None


class GroupOutput:
    """Accumulates one metric group's scalars and artifacts."""

    def __init__(self) -> None:
        self.scalars: dict[str, float] = {}
        self.artifacts: list[Artifact] = []

    def scalar(self, name: str, value: float) -> "GroupOutput":
        self.scalars[name] = float(value)
        return self

    def figure(self, fig: Any, path: str, **save_kwargs: Any) -> "GroupOutput":
        self.artifacts.append(
            Artifact(FIGURE, fig, path, save_kwargs or None)
        )
        return self

    def table(self, frame: Any, path: str) -> "GroupOutput":
        self.artifacts.append(Artifact(TABLE, frame, path))
        return self

    def mapping(self, data: dict[str, Any], path: str) -> "GroupOutput":
        self.artifacts.append(Artifact(MAPPING, data, path))
        return self

    def merge(self, other: "GroupOutput") -> "GroupOutput":
        """Fold a sub-computation's output into this one (used by groups
        assembled from several passes, e.g. taxonomic)."""
        self.scalars.update(other.scalars)
        self.artifacts.extend(other.artifacts)
        return self

    def tables(self) -> list[Artifact]:
        return [a for a in self.artifacts if a.kind == TABLE]

    def figures(self) -> list[Artifact]:
        return [a for a in self.artifacts if a.kind == FIGURE]

    def mappings(self) -> list[Artifact]:
        return [a for a in self.artifacts if a.kind == MAPPING]
