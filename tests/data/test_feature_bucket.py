"""Feature-bucket builder tests: idempotent writes, resume-after-crash,
per-image failure isolation (reference analog:
tests/test_build_feature_bucket.py:275-360 crash/resume scenarios)."""

import io
import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from mermaid_classifier_tpu.data.feature_bucket import (
    FeatureBucketBuilder,
    annotations_key,
    feature_key,
)
from mermaid_classifier_tpu.data.features_io import read_feature_file
from mermaid_classifier_tpu.data.store import LocalFSObjectStore
from mermaid_classifier_tpu.models.efficientnet import EfficientNetConfig
from mermaid_classifier_tpu.models.extractor import build_extractor

SRC = "src-bucket"
DST = "dst-bucket"

TINY_CONFIG = EfficientNetConfig(
    stem_channels=8,
    stages=((1, 8, 1, 1, 3),),
    head_channels=16,
    feature_dim=16,
    patch_size=32,
)


def _png_bytes(rng, h=64, w=64) -> bytes:
    from PIL import Image

    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture()
def store(tmp_path):
    return LocalFSObjectStore(tmp_path / "store")


@pytest.fixture()
def populated(store):
    """Two sources; source 1 has 2 images x 2 points, source 2 has 1 image."""
    rng = np.random.default_rng(0)
    for source_id, image_ids in (("1", ["10", "11"]), ("2", ["20"])):
        rows = []
        for image_id in image_ids:
            key = f"s{source_id}/images/{image_id}.png"
            store.put_bytes(SRC, key, _png_bytes(rng))
            rows.append({"image_id": image_id, "image_key": key, "row": 10, "col": 20})
            rows.append({"image_id": image_id, "image_key": key, "row": 30, "col": 40})
        csv_bytes = pd.DataFrame(rows).to_csv(index=False).encode()
        store.put_bytes(SRC, annotations_key(source_id), csv_bytes)
    return store


def make_builder(store, tmp_path, **kwargs):
    extractor = build_extractor(config=TINY_CONFIG, backbone_batch=8)
    return FeatureBucketBuilder(
        store, SRC, DST, extractor,
        progress_log=tmp_path / "progress.jsonl",
        error_log=tmp_path / "errors.csv",
        **kwargs,
    )


class TestFeatureBucket:
    def test_end_to_end(self, populated, tmp_path):
        builder = make_builder(populated, tmp_path)
        result = builder.run(["1", "2"])
        assert result.exit_code == 0
        assert result.describe().startswith("2 sources: 3 images extracted")
        # Feature files exist and parse, annotations copied.
        rowcols, feats = read_feature_file_from_store(populated, "1", "10")
        assert rowcols.shape == (2, 2)
        assert feats.shape == (2, 16)
        assert populated.exists(DST, annotations_key("1"))
        # Progress JSONL has one line per image.
        lines = (tmp_path / "progress.jsonl").read_text().splitlines()
        assert len(lines) == 3
        assert json.loads(lines[0])["points"] == 2

    def test_resume_skips_existing(self, populated, tmp_path):
        builder = make_builder(populated, tmp_path)
        # Simulate a crashed worker that finished image 10 only.
        builder.process_source("1")
        populated.delete(DST, feature_key("1", "11"))

        builder2 = make_builder(populated, tmp_path)
        result = builder2.process_source("1")
        assert result.images_skipped == 1
        assert result.images_done == 1

    def test_no_skip_existing_redoes_everything(self, populated, tmp_path):
        builder = make_builder(populated, tmp_path)
        builder.process_source("1")
        builder2 = make_builder(populated, tmp_path, skip_existing=False)
        result = builder2.process_source("1")
        assert result.images_done == 2
        assert result.images_skipped == 0

    def test_progress_log_failure_does_not_fail_images(self, populated, tmp_path):
        """The bucket, not the log, is the progress truth: a progress-log
        write failure (e.g. full disk) must neither mark images failed nor
        kill the writer thread (which would deadlock the bounded queue)."""
        builder = make_builder(populated, tmp_path)

        def broken_progress(record):
            raise OSError("disk full")

        builder._record_progress = broken_progress
        result = builder.process_source("1")
        assert result.images_done == 2
        assert result.images_failed == 0
        # Features really are in the bucket despite the dead log.
        rowcols, _ = read_feature_file_from_store(populated, "1", "10")
        assert rowcols.shape == (2, 2)

    def test_per_image_failure_isolation(self, populated, tmp_path):
        # Corrupt one image: the other image still extracts, run continues,
        # failure is logged, exit code is 1.
        populated.put_bytes(SRC, "s1/images/10.png", b"not a png")
        builder = make_builder(populated, tmp_path)
        result = builder.run(["1"])
        assert result.exit_code == 1
        source = result.sources[0]
        assert source.images_done == 1
        assert source.images_failed == 1
        assert source.failures[0][0] == "10"
        errors = (tmp_path / "errors.csv").read_text()
        assert "10" in errors

    def test_missing_annotation_column_raises(self, populated, tmp_path):
        populated.put_bytes(
            SRC, annotations_key("1"),
            b"image_id,row,col\n10,1,2\n",
        )
        builder = make_builder(populated, tmp_path)
        with pytest.raises(ValueError, match="missing columns.*image_key"):
            builder.read_annotations("1")


def read_feature_file_from_store(store, source_id, image_id):
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        local = Path(td) / "f.npz"
        store.download(DST, feature_key(source_id, image_id), local)
        return read_feature_file(local)


class TestSourceAvailability:
    def test_filter_to_available_sources(self, populated, tmp_path):
        builder = make_builder(populated, tmp_path)
        available, missing = builder.filter_to_available_sources(
            ["1", "2", "9"]
        )
        assert available == ["1", "2"]
        assert missing == ["9"]


class TestCoralNetLayout:
    """Raw CoralNet-export source buckets: annotations keyed by Name with
    a separate image_list.csv mapping names (status-suffixed) to numeric
    IDs, images at s{id}/images/{id}.jpg (reference:
    build_feature_bucket.py:569-670, tests :408-507)."""

    @pytest.fixture()
    def coralnet_store(self, store):
        rng = np.random.default_rng(1)
        sid = "9"
        for image_id in ("100", "200", "300"):
            store.put_bytes(
                SRC, f"s{sid}/images/{image_id}.jpg", _png_bytes(rng)
            )
        ann = pd.DataFrame([
            {"Name": "a.JPG", "Row": 5, "Column": 6},
            {"Name": "a.JPG", "Row": 7, "Column": 8},
            {"Name": "b.JPG", "Row": 9, "Column": 10},
            {"Name": "c.JPG", "Row": 1, "Column": 2},
            {"Name": "ghost.JPG", "Row": 3, "Column": 4},  # unmapped
        ])
        store.put_bytes(SRC, annotations_key(sid),
                        ann.to_csv(index=False).encode())
        lst = pd.DataFrame([
            {"Name": "a.JPG - Confirmed",
             "Image Page": "/image/100/view/", "Image URL": ""},
            {"Name": "b.JPG - Unconfirmed",
             "Image Page": "/image/200/view/", "Image URL": ""},
            {"Name": "c.JPG - Unclassified",
             "Image Page": "/image/300/view/", "Image URL": ""},
        ])
        store.put_bytes(SRC, f"s{sid}/image_list.csv",
                        lst.to_csv(index=False).encode())
        return store

    def test_names_map_through_image_list(self, coralnet_store, tmp_path):
        builder = make_builder(coralnet_store, tmp_path)
        df = builder.read_annotations("9")
        assert sorted(df["image_id"].unique()) == ["100", "200", "300"]
        assert set(df.columns) >= {"image_id", "image_key", "row", "col"}
        a_rows = df[df["image_id"] == "100"]
        assert list(zip(a_rows["row"], a_rows["col"])) == [(5, 6), (7, 8)]
        assert a_rows["image_key"].iloc[0] == "s9/images/100.jpg"
        # The unmapped ghost.JPG row is dropped, not extracted.
        assert len(df) == 4

    def test_end_to_end_extraction(self, coralnet_store, tmp_path):
        builder = make_builder(coralnet_store, tmp_path)
        result = builder.process_source("9")
        assert result.images_failed == 0
        assert result.images_done == 3
        assert result.points_done == 4
        rowcols, feats = read_feature_file_from_store(
            coralnet_store, "9", "100"
        )
        assert rowcols.shape == (2, 2) and feats.shape == (2, 16)

    def test_missing_image_list_is_loud(self, store, tmp_path):
        ann = pd.DataFrame([{"Name": "a.JPG", "Row": 1, "Column": 2}])
        store.put_bytes(SRC, annotations_key("7"),
                        ann.to_csv(index=False).encode())
        builder = make_builder(store, tmp_path)
        with pytest.raises(ValueError, match="image_list.csv"):
            builder.read_annotations("7")

    def test_malformed_image_list_is_loud(self, store, tmp_path):
        ann = pd.DataFrame([{"Name": "a.JPG", "Row": 1, "Column": 2}])
        store.put_bytes(SRC, annotations_key("8"),
                        ann.to_csv(index=False).encode())
        store.put_bytes(SRC, "s8/image_list.csv", b"foo,bar\n1,2\n")
        builder = make_builder(store, tmp_path)
        with pytest.raises(ValueError, match="required columns"):
            builder.read_annotations("8")
