"""Fixture environment for TrainingDataset pipeline tests: a local object
store with CoralNet+MERMAID-layout feature files, manifest/annotation
parquets, and fixture-backed taxonomy (reference analog: the hand-built
DuckDB tables + fake S3 of tests/pyspacer/test_train.py and
test_training_dataset_pipeline.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from mermaid_classifier_tpu.data.features_io import write_feature_file
from mermaid_classifier_tpu.data.store import LocalFSObjectStore

BUCKET = "test-train-bucket"
FEATURE_DIM = 8

# CoralNet label ids: 1001 -> (ba-acro, gf-br), 1002 -> (ba-algae, ''),
# 9999 -> unmapped (see tests/common/taxonomy_fixtures.MAPPING_RECORDS).
CN_LABELS = ["1001", "1002", "9999"]


def build_environment(
    tmp_path,
    n_sources: int = 2,
    images_per_source: int = 4,
    points_per_image: int = 12,
    n_mermaid_images: int = 6,
    unmapped_fraction: float = 0.1,
    skip_feature_files: tuple[str, ...] = (),
    seed: int = 0,
):
    """Build store + parquets. Returns (store, manifest_path, mermaid_path).

    ``skip_feature_files`` lists feature keys deliberately absent from the
    store (exercises missing-feature tolerance).
    """
    rng = np.random.default_rng(seed)
    store = LocalFSObjectStore(tmp_path / "store")
    store_root = store.root / BUCKET

    # CoralNet manifest + feature files
    manifest_rows = []
    for source_id in range(1, n_sources + 1):
        for image_num in range(images_per_source):
            image_id = source_id * 1000 + image_num
            rowcols = np.stack(
                [
                    np.arange(points_per_image) * 13 + 7,
                    np.arange(points_per_image) * 17 + 3,
                ],
                axis=1,
            ).astype(np.int32)
            for r, c in rowcols:
                label = (
                    "9999"
                    if rng.random() < unmapped_fraction
                    else str(rng.choice(["1001", "1002"]))
                )
                manifest_rows.append(
                    {
                        "source_id": source_id,
                        "image_id": image_id,
                        "row": int(r),
                        "col": int(c),
                        "coralnet_id": label,
                    }
                )
            key = f"s{source_id}/features/i{image_id}.features.npz"
            if key not in skip_feature_files:
                feats = rng.normal(size=(points_per_image, FEATURE_DIM)).astype(
                    np.float32
                )
                path = store_root / key
                write_feature_file(path, rowcols, feats)

    manifest_path = str(tmp_path / "manifest.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(manifest_rows)), manifest_path)

    # MERMAID annotations parquet + feature files
    mermaid_rows = []
    for image_num in range(n_mermaid_images):
        image_id = f"m{image_num:03d}"
        rowcols = np.stack(
            [np.arange(points_per_image) * 11 + 5, np.arange(points_per_image) * 7 + 9],
            axis=1,
        ).astype(np.int32)
        for r, c in rowcols:
            ba = str(rng.choice(["ba-acro", "ba-porites", "ba-algae"]))
            gf = str(rng.choice(["gf-br", "gf-ma", "None"]))
            mermaid_rows.append(
                {
                    "image_id": image_id,
                    "row": int(r),
                    "col": int(c),
                    "benthic_attribute_id": ba,
                    "growth_form_id": gf,
                }
            )
        key = f"mermaid/{image_id}.features.npz"
        if key not in skip_feature_files:
            feats = rng.normal(size=(points_per_image, FEATURE_DIM)).astype(np.float32)
            write_feature_file(store_root / key, rowcols, feats)

    mermaid_path = str(tmp_path / "mermaid.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(mermaid_rows)), mermaid_path)

    return store, manifest_path, mermaid_path


def patch_taxonomy(monkeypatch):
    """Point the dataset module's taxonomy getters at the in-memory fixtures
    (reference analog: CLAUDE.md:123 'CoralNetMermaidMapping is mocked')."""
    import mermaid_classifier_tpu.data.dataset as dataset_mod
    from tests.common.taxonomy_fixtures import (
        make_ba_library,
        make_gf_library,
        make_mapping,
    )

    monkeypatch.setattr(dataset_mod, "get_coralnet_mapping", make_mapping)
    monkeypatch.setattr(
        dataset_mod, "get_benthic_attribute_library", make_ba_library
    )
    monkeypatch.setattr(dataset_mod, "get_growth_form_library", make_gf_library)
