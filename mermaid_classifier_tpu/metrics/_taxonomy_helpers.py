"""Shared taxonomy helpers used by multiple metric groups
(reference: metrics/_taxonomy_helpers.py:18-122)."""

from __future__ import annotations

import typing
from collections import defaultdict

from mermaid_classifier_tpu.common.taxonomy import split_ba_gf

if typing.TYPE_CHECKING:
    from mermaid_classifier_tpu.common.taxonomy import BenthicAttributeLibrary


def build_ba_to_top(
    classes: list[str], ba_library: "BenthicAttributeLibrary"
) -> dict[str, str]:
    """Map each BA ID (extracted from BAGF class IDs) to its root ancestor."""
    out: dict[str, str] = {}
    for bagf_id in classes:
        ba_id, _ = split_ba_gf(bagf_id)
        if ba_id not in out:
            out[ba_id] = ba_library.top_level_ancestor(ba_id)
    return out


def build_ba_paths(
    classes: list[str], ba_library: "BenthicAttributeLibrary"
) -> dict[str, list[str]]:
    """Map each BA ID to its root-to-leaf path [root, ..., parent, self]."""
    out: dict[str, list[str]] = {}
    for bagf_id in classes:
        ba_id, _ = split_ba_gf(bagf_id)
        if ba_id not in out:
            out[ba_id] = ba_library.get_ancestor_ids(ba_id) + [ba_id]
    return out


def find_lca(ba_a: str, ba_b: str, ba_paths: dict[str, list[str]]) -> str | None:
    """Last common node of the two root-to-leaf paths; None when they diverge
    at the root (different top-level branches)."""
    lca = None
    for a, b in zip(ba_paths[ba_a], ba_paths[ba_b]):
        if a != b:
            break
        lca = a
    return lca


def taxonomic_similarity(
    ba_a: str,
    ba_b: str,
    ba_paths: dict[str, list[str]],
    ba_library: "BenthicAttributeLibrary",
) -> float:
    """Fraction of taxonomic path shared: 1.0 exact, ~0.75 siblings,
    0.0 unrelated top-level branches."""
    if ba_a == ba_b:
        return 1.0
    lca = find_lca(ba_a, ba_b, ba_paths)
    if lca is None:
        return 0.0
    shared_depth = len(ba_library.get_ancestor_ids(lca)) + 1
    max_depth = max(len(ba_paths[ba_a]), len(ba_paths[ba_b]))
    return shared_depth / max_depth


def group_by_top_level(
    sample_indices: list[int],
    gt_indices: list[int],
    classes: list[str],
    ba_to_top: dict[str, str],
    ba_library: "BenthicAttributeLibrary",
    min_samples: int = 30,
) -> list[dict]:
    """Group sample indices by their ground truth's top-level BA; categories
    under ``min_samples`` are excluded. Returns dicts with top_ba_id, name,
    indices, n_samples."""
    by_top: dict[str, list[int]] = defaultdict(list)
    for i in sample_indices:
        gt_ba, _ = split_ba_gf(classes[gt_indices[i]])
        by_top[ba_to_top[gt_ba]].append(i)
    return [
        {
            "top_ba_id": top_id,
            "name": ba_library.id_to_name(top_id),
            "indices": indices,
            "n_samples": len(indices),
        }
        for top_id, indices in by_top.items()
        if len(indices) >= min_samples
    ]
