"""Training-config directory generator.

Rebuild of the reference's config generator
(reference: scripts/generate_training_config.py:1-140): from the BA taxonomy
plus per-class annotation counts, produce a committed config dir:

- ``included_labels.csv``   — the label set the classifier trains on;
- ``rollups.csv``           — every other annotated label rolled up to its
  nearest included ancestor;
- ``sources.csv``           — the source list (passed through);
- ``training_config.yaml``  — a ready-to-run config referencing the CSVs;
- ``README.md``             — the audit trail: how the label set was chosen.

Selection policy (the reference's top-N ancestor walk, genericized):

1. Rank benthic attributes by total annotation count (GFs summed).
2. Keep the top ``top_n`` BAs, minus ``excluded_names``.
3. For selected BAs listed in ``gf_buckets``, keep the named (BA, GF)
   combos as distinct labels (the reference's Porites growth-form buckets);
   all other GFs of that BA roll up to the bare BA.
4. Every non-selected annotated BA rolls up to its nearest selected
   ancestor (root-ward walk); BAs with no selected ancestor are excluded
   (recorded in the README).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import pandas as pd

from mermaid_classifier_tpu.common.taxonomy import (
    BenthicAttributeLibrary,
    GrowthFormLibrary,
)


@dataclass
class GeneratedConfig:
    included: pd.DataFrame          # columns ba_id, gf_id
    rollups: pd.DataFrame           # columns from_ba_id, from_gf_id, to_ba_id, to_gf_id
    excluded: list[str] = field(default_factory=list)  # ba_ids with no home

    @property
    def n_labels(self) -> int:
        return len(self.included)


def select_labels(
    ba_library: BenthicAttributeLibrary,
    counts: pd.DataFrame,
    *,
    top_n: int = 100,
    excluded_names: set[str] | None = None,
    gf_buckets: dict[str, list[str]] | None = None,
    gf_library: GrowthFormLibrary | None = None,
) -> GeneratedConfig:
    """Apply the selection policy; ``counts`` has columns
    (ba_id, gf_id, count)."""
    excluded_names = excluded_names or set()
    gf_buckets = gf_buckets or {}
    required = {"ba_id", "gf_id", "count"}
    if missing := required - set(counts.columns):
        raise ValueError(f"counts is missing columns {sorted(missing)}")

    per_ba = counts.groupby("ba_id")["count"].sum().sort_values(ascending=False)
    unknown = [b for b in per_ba.index if b not in ba_library.by_id]
    if unknown:
        raise ValueError(f"counts references unknown ba_ids: {unknown[:5]}")

    selected: list[str] = []
    for ba_id in per_ba.index:
        if ba_library.id_to_name(ba_id) in excluded_names:
            continue
        selected.append(ba_id)
        if len(selected) >= top_n:
            break
    selected_set = set(selected)

    # GF buckets: named (BA, GF) combos become distinct labels.
    bucket_rows: list[dict] = []
    bucket_index: dict[str, set[str]] = {}
    for ba_name, gf_names in gf_buckets.items():
        ba_id = ba_library.name_to_id(ba_name)
        if ba_id not in selected_set:
            raise ValueError(
                f"gf_buckets names {ba_name!r}, which is not a selected label."
            )
        if gf_library is None:
            raise ValueError("gf_buckets requires gf_library.")
        gf_ids = set()
        for gf_name in gf_names:
            matches = [i for i, n in gf_library.by_id.items() if n == gf_name]
            if not matches:
                raise ValueError(f"unknown growth form name {gf_name!r}.")
            gf_ids.add(matches[0])
        bucket_index[ba_id] = gf_ids
        bucket_rows.extend(
            {"ba_id": ba_id, "gf_id": gf_id} for gf_id in sorted(gf_ids)
        )

    included_rows = [
        {"ba_id": ba_id, "gf_id": ""} for ba_id in selected
    ] + bucket_rows

    # Rollups. Every annotated (ba, gf) combo must end at an included label
    # or be explicitly excluded — nothing may silently fall through the
    # inclusion filter.
    rollup_rows: list[dict] = []
    excluded_ids: list[str] = []
    for ba_id in per_ba.index:
        annotated_gfs = set(
            counts.loc[counts["ba_id"] == ba_id, "gf_id"].astype(str)
        )
        if ba_id in selected_set:
            # GFs outside the BA's bucket set (all GFs, for non-bucketed
            # BAs) collapse to the bare BA.
            kept_gfs = bucket_index.get(ba_id, set())
            for gf_id in sorted((annotated_gfs - {""}) - kept_gfs):
                rollup_rows.append(
                    {"from_ba_id": ba_id, "from_gf_id": gf_id,
                     "to_ba_id": ba_id, "to_gf_id": ""}
                )
            continue
        target = next(
            (a for a in reversed(ba_library.get_ancestor_ids(ba_id))
             if a in selected_set),
            None,
        )
        if target is None:
            excluded_ids.append(ba_id)
            continue
        # One rule per annotated combo of this BA (GF'd or bare), all
        # landing on the bare target label.
        for gf_id in sorted(annotated_gfs):
            rollup_rows.append(
                {"from_ba_id": ba_id, "from_gf_id": gf_id,
                 "to_ba_id": target, "to_gf_id": ""}
            )

    return GeneratedConfig(
        included=pd.DataFrame(
            included_rows, columns=["ba_id", "gf_id"]
        ).drop_duplicates().reset_index(drop=True),
        rollups=pd.DataFrame(
            rollup_rows,
            columns=["from_ba_id", "from_gf_id", "to_ba_id", "to_gf_id"],
        ),
        excluded=excluded_ids,
    )


_CONFIG_YAML = """\
dataset:
  include_mermaid: true
  label_rollup_spec_csv: rollups.csv
  included_labels_csv: included_labels.csv
  ref_val_ratios: [0.1, 0.1]
  subsample:
    strategy: balanced
    total_annotations: {total_annotations}
    min_per_class: {min_per_class}
  weighting:
    enabled: true
    weight_ratio_cap: 5000
training:
  epochs: {epochs}
  early_stopping_patience: 3
tracking:
  experiment_name: {experiment_name}
"""


def write_config_dir(
    output_dir: str | Path,
    generated: GeneratedConfig,
    ba_library: BenthicAttributeLibrary,
    *,
    sources: list[str] | None = None,
    total_annotations: int = 500_000,
    min_per_class: int = 200,
    epochs: int = 40,
    experiment_name: str = "mermaid-classifier",
) -> Path:
    """Write the committed config dir + audit README."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    generated.included.to_csv(output_dir / "included_labels.csv", index=False)
    generated.rollups.to_csv(output_dir / "rollups.csv", index=False)
    if sources:
        pd.DataFrame({"source_id": sources}).to_csv(
            output_dir / "sources.csv", index=False
        )
    (output_dir / "training_config.yaml").write_text(
        _CONFIG_YAML.format(
            total_annotations=total_annotations,
            min_per_class=min_per_class,
            epochs=epochs,
            experiment_name=experiment_name,
        )
    )

    def name(ba_id: str) -> str:
        return ba_library.id_to_name(ba_id) if ba_id else ""

    lines = [
        "# Training config audit",
        "",
        f"- {generated.n_labels} included labels"
        f" ({len(generated.included[generated.included.gf_id != ''])} with"
        " growth-form buckets).",
        f"- {len(generated.rollups)} rollup rules.",
        f"- {len(generated.excluded)} annotated attributes excluded (no"
        " selected ancestor):",
    ]
    lines += [f"  - {name(b)} ({b})" for b in generated.excluded] or ["  - none"]
    lines += ["", "## Included labels", ""]
    lines += [
        f"- {name(r.ba_id)}"
        + (f" [{r.gf_id}]" if r.gf_id else "")
        for r in generated.included.itertuples()
    ]
    (output_dir / "README.md").write_text("\n".join(lines) + "\n")
    return output_dir
