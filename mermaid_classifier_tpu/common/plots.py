"""Point-marker plotting: annotated-point overlays on reef images.

Capability parity with the reference's plot utilities
(reference: mermaid_classifier/common/plots.py:14-168): scatter markers
grouped by label with outlined text annotations, plus a standalone legend
figure. Matplotlib is imported lazily so the training/inference lanes never
pay for it.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class PointMarker:
    """One annotated point: position, marker shape/color group, and an
    optional text label drawn next to it."""

    row: int
    col: int
    group: str = ""
    text: str = ""
    extras: dict[str, Any] = field(default_factory=dict)


_MARKER_CYCLE = ("o", "s", "^", "D", "v", "P", "X", "*")
_COLOR_CYCLE = (
    "#e6194b", "#3cb44b", "#ffe119", "#4363d8", "#f58231",
    "#911eb4", "#46f0f0", "#f032e6", "#bcf60c", "#fabebe",
)


def group_style(index: int) -> dict[str, Any]:
    """Deterministic marker/color pairing for the index-th group."""
    return {
        "marker": _MARKER_CYCLE[index % len(_MARKER_CYCLE)],
        "color": _COLOR_CYCLE[index % len(_COLOR_CYCLE)],
    }


def plot_point_markers(
    ax: Any,
    markers: list[PointMarker],
    *,
    marker_size: float = 90.0,
    text_size: float = 9.0,
    text_offset: tuple[float, float] = (6.0, -6.0),
) -> dict[str, dict[str, Any]]:
    """Draw grouped scatter markers with outlined text on ``ax``.

    Returns {group: style} so a legend can be built with ``plot_legend``.
    Groups are assigned styles in first-appearance order (stable across
    calls with the same marker list — the reference's grouped-scatter
    contract, reference: plots.py:43-118).
    """
    import matplotlib.patheffects as path_effects

    styles: dict[str, dict[str, Any]] = {}
    for m in markers:
        if m.group not in styles:
            styles[m.group] = group_style(len(styles))

    for group, style in styles.items():
        cols = [m.col for m in markers if m.group == group]
        rows = [m.row for m in markers if m.group == group]
        ax.scatter(
            cols,
            rows,
            s=marker_size,
            marker=style["marker"],
            facecolors="none",
            edgecolors=style["color"],
            linewidths=2.0,
            label=group,
        )
    for m in markers:
        if not m.text:
            continue
        txt = ax.annotate(
            m.text,
            (m.col, m.row),
            xytext=text_offset,
            textcoords="offset points",
            fontsize=text_size,
            color="white",
        )
        # White text with a black outline stays readable on any reef pixel.
        txt.set_path_effects(
            [path_effects.Stroke(linewidth=2.0, foreground="black"),
             path_effects.Normal()]
        )
    return styles


def plot_legend(styles: dict[str, dict[str, Any]], *, figsize=(4.0, None)):
    """Build a standalone legend figure from a {group: style} mapping
    (reference: plots.py:131-168). Returns the matplotlib Figure."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    from matplotlib.lines import Line2D

    height = figsize[1] if figsize[1] is not None else max(1.0, 0.3 * len(styles))
    fig, ax = plt.subplots(figsize=(figsize[0], height))
    handles = [
        Line2D(
            [], [],
            marker=style["marker"],
            linestyle="none",
            markerfacecolor="none",
            markeredgecolor=style["color"],
            markeredgewidth=2.0,
            label=group,
        )
        for group, style in styles.items()
    ]
    ax.legend(handles=handles, loc="center", frameon=False)
    ax.axis("off")
    return fig
