"""Per-point CoralNet training-manifest builder.

Joins the ETL annotation table against the ETL image table to produce the
manifest the training dataset consumes — one row per annotated point, only
for images whose header probe succeeded and whose object key is known
(capability parity with reference: mermaid_classifier/coralnet/manifest.py:50-125;
column contract consumed by data/dataset.py read_coralnet_manifest).

Input tables (parquet):

- annotations: source_id, image_id, row, col, coralnet_id  (one row / point)
- images:      source_id, image_id, header_status, s3_key  (one row / image)

Output manifest columns (``MANIFEST_COLUMNS``): source_id, image_id, row,
col, coralnet_id, s3_key. Images are kept only when
``header_status = 'ok'`` AND ``s3_key`` is non-null/non-empty
(reference: manifest.py:66-85).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import pandas as pd

from mermaid_classifier_tpu.common.relational import Database

MANIFEST_COLUMNS = (
    "source_id",
    "image_id",
    "row",
    "col",
    "coralnet_id",
    "s3_key",
)

_ANNOTATION_REQUIRED = {"source_id", "image_id", "row", "col", "coralnet_id"}
_IMAGE_REQUIRED = {"source_id", "image_id", "header_status", "s3_key"}


@dataclass(frozen=True)
class BuildSummary:
    """Counts for auditing a manifest build (reference: manifest.py:93-125)."""

    total_annotations: int
    manifest_rows: int
    images_total: int
    images_ok: int
    images_bad_header: int
    images_missing_key: int
    manifest_sources: int
    manifest_images: int

    def describe(self) -> str:
        return (
            f"annotations in: {self.total_annotations:,};"
            f" manifest rows out: {self.manifest_rows:,}"
            f" ({self.manifest_sources} sources, {self.manifest_images:,} images)."
            f" Images: {self.images_total:,} total, {self.images_ok:,} ok,"
            f" {self.images_bad_header:,} bad header,"
            f" {self.images_missing_key:,} missing key."
        )


def _load_table(db: Database, name: str, source: str | Path | pd.DataFrame,
                required: set[str]) -> None:
    if isinstance(source, pd.DataFrame):
        df = source
    else:
        import pyarrow.parquet as pq

        df = pq.read_table(str(source)).to_pandas()
    missing = required - set(df.columns)
    if missing:
        raise ValueError(
            f"{name} table is missing columns {sorted(missing)};"
            f" has {sorted(df.columns)}"
        )
    db.create_table_from_df(name, df)


def build_manifest(
    annotations: str | Path | pd.DataFrame,
    images: str | Path | pd.DataFrame,
    db: Database | None = None,
) -> tuple[pd.DataFrame, BuildSummary]:
    """Join annotations x images into the per-point manifest.

    Returns (manifest_df, summary). Deterministic output order:
    (source_id, image_id, row, col).
    """
    db = db or Database()
    _load_table(db, "ann", annotations, _ANNOTATION_REQUIRED)
    _load_table(db, "img", images, _IMAGE_REQUIRED)

    images_total = db.row_count("img")
    images_bad_header = int(
        db.scalar("SELECT count(*) FROM img WHERE header_status IS NOT 'ok'")
    )
    images_missing_key = int(
        db.scalar(
            "SELECT count(*) FROM img WHERE header_status = 'ok'"
            " AND (s3_key IS NULL OR s3_key = '')"
        )
    )
    db.execute(
        "CREATE TEMP TABLE img_ok AS SELECT source_id, image_id, s3_key"
        " FROM img WHERE header_status = 'ok'"
        " AND s3_key IS NOT NULL AND s3_key != ''"
    )
    images_ok = int(db.scalar("SELECT count(*) FROM img_ok"))

    manifest = db.query_df(
        "SELECT a.source_id, a.image_id, a.row, a.col, a.coralnet_id, i.s3_key"
        " FROM ann a JOIN img_ok i"
        " ON a.source_id = i.source_id AND a.image_id = i.image_id"
        " ORDER BY a.source_id, a.image_id, a.row, a.col"
    )
    summary = BuildSummary(
        total_annotations=db.row_count("ann"),
        manifest_rows=len(manifest),
        images_total=images_total,
        images_ok=images_ok,
        images_bad_header=images_bad_header,
        images_missing_key=images_missing_key,
        manifest_sources=int(manifest["source_id"].nunique()),
        manifest_images=int(manifest["image_id"].nunique()),
    )
    return manifest, summary


def write_manifest(manifest: pd.DataFrame, path: str | Path) -> None:
    """Write the manifest parquet; refuses to write an empty manifest
    (reference: scripts/build_coralnet_manifest.py:107-109)."""
    if len(manifest) == 0:
        raise ValueError(
            "Refusing to write an empty manifest — the join produced no"
            " rows. Check header_status / s3_key coverage in the images"
            " table."
        )
    missing = set(MANIFEST_COLUMNS) - set(manifest.columns)
    if missing:
        raise ValueError(f"manifest is missing columns {sorted(missing)}")
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(
            manifest[list(MANIFEST_COLUMNS)], preserve_index=False
        ),
        str(path),
    )


def audit_manifest(manifest: pd.DataFrame) -> list[str]:
    """Best-effort warnings pass over a built manifest
    (reference: scripts/build_coralnet_manifest.py:96-105)."""
    warnings: list[str] = []
    if (manifest["row"] < 0).any() or (manifest["col"] < 0).any():
        warnings.append("manifest contains negative row/col point positions")
    dupes = manifest.duplicated(
        subset=["source_id", "image_id", "row", "col"]
    ).sum()
    if dupes:
        warnings.append(
            f"manifest contains {int(dupes)} duplicate (source, image, row,"
            f" col) points"
        )
    empty_labels = (
        manifest["coralnet_id"].isna() | (manifest["coralnet_id"].astype(str) == "")
    ).sum()
    if empty_labels:
        warnings.append(
            f"manifest contains {int(empty_labels)} rows with empty coralnet_id"
        )
    return warnings
