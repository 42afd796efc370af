"""Manifest builder tests (reference analog: tests/coralnet/test_manifest.py)."""

import tempfile
import unittest
from pathlib import Path

import pandas as pd

from mermaid_classifier_tpu.coralnet.manifest import (
    MANIFEST_COLUMNS,
    audit_manifest,
    build_manifest,
    write_manifest,
)


def _tables():
    annotations = pd.DataFrame(
        {
            "source_id": [1, 1, 1, 2, 2, 3],
            "image_id": [10, 10, 11, 20, 21, 30],
            "row": [5, 8, 5, 5, 5, 5],
            "col": [5, 8, 5, 5, 5, 5],
            "coralnet_id": ["100", "101", "100", "102", "102", "103"],
        }
    )
    images = pd.DataFrame(
        {
            "source_id": [1, 1, 2, 2, 3],
            "image_id": [10, 11, 20, 21, 30],
            "header_status": ["ok", "ok", "ok", "error", "ok"],
            "s3_key": ["a/10.jpg", "a/11.jpg", "b/20.jpg", "b/21.jpg", None],
        }
    )
    return annotations, images


class TestBuildManifest(unittest.TestCase):
    def test_join_filters_bad_header_and_missing_key(self):
        annotations, images = _tables()
        manifest, summary = build_manifest(annotations, images)
        # image 21 dropped (bad header), image 30 dropped (missing key).
        self.assertEqual(list(manifest.columns), list(MANIFEST_COLUMNS))
        self.assertEqual(len(manifest), 4)
        self.assertEqual(set(manifest["image_id"]), {10, 11, 20})
        self.assertEqual(summary.total_annotations, 6)
        self.assertEqual(summary.manifest_rows, 4)
        self.assertEqual(summary.images_bad_header, 1)
        self.assertEqual(summary.images_missing_key, 1)
        self.assertEqual(summary.images_ok, 3)
        self.assertEqual(summary.manifest_sources, 2)
        self.assertIn("manifest rows out: 4", summary.describe())

    def test_deterministic_order(self):
        annotations, images = _tables()
        m1, _ = build_manifest(annotations.sample(frac=1, random_state=0), images)
        m2, _ = build_manifest(annotations.sample(frac=1, random_state=7), images)
        pd.testing.assert_frame_equal(m1, m2)

    def test_missing_column_raises(self):
        annotations, images = _tables()
        with self.assertRaisesRegex(ValueError, "missing columns.*coralnet_id"):
            build_manifest(annotations.drop(columns=["coralnet_id"]), images)

    def test_parquet_roundtrip_and_empty_refusal(self):
        annotations, images = _tables()
        manifest, _ = build_manifest(annotations, images)
        with tempfile.TemporaryDirectory() as td:
            ann_p = Path(td) / "ann.parquet"
            img_p = Path(td) / "img.parquet"
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(pa.Table.from_pandas(annotations), str(ann_p))
            pq.write_table(pa.Table.from_pandas(images), str(img_p))
            from_parquet, _ = build_manifest(ann_p, img_p)
            pd.testing.assert_frame_equal(from_parquet, manifest)

            out = Path(td) / "manifest.parquet"
            write_manifest(manifest, out)
            back = pq.read_table(str(out)).to_pandas()
            self.assertEqual(len(back), len(manifest))

            with self.assertRaisesRegex(ValueError, "empty manifest"):
                write_manifest(manifest.iloc[0:0], out)

    def test_audit_warnings(self):
        annotations, images = _tables()
        manifest, _ = build_manifest(annotations, images)
        self.assertEqual(audit_manifest(manifest), [])
        bad = manifest.copy()
        bad.loc[0, "row"] = -1
        bad.loc[1, "coralnet_id"] = ""
        warnings = audit_manifest(pd.concat([bad, bad.iloc[[2]]]))
        self.assertEqual(len(warnings), 3)  # negative, duplicate, empty label


class TestManifestCli(unittest.TestCase):
    def test_cli_end_to_end(self):
        import importlib.util
        import sys

        spec = importlib.util.spec_from_file_location(
            "build_coralnet_manifest",
            Path(__file__).resolve().parents[2] / "scripts" / "build_coralnet_manifest.py",
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)

        annotations, images = _tables()
        with tempfile.TemporaryDirectory() as td:
            import pyarrow as pa
            import pyarrow.parquet as pq

            ann_p = str(Path(td) / "ann.parquet")
            img_p = str(Path(td) / "img.parquet")
            out_p = str(Path(td) / "manifest.parquet")
            pq.write_table(pa.Table.from_pandas(annotations), ann_p)
            pq.write_table(pa.Table.from_pandas(images), img_p)
            rc = mod.main(
                ["--annotations-parquet", ann_p, "--images-parquet", img_p,
                 "--output", out_p]
            )
            self.assertEqual(rc, 0)
            self.assertEqual(len(pq.read_table(out_p).to_pandas()), 4)


if __name__ == "__main__":
    unittest.main()
