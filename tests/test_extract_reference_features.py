"""Behavioral tests for the parity-fixture extractor script: npz + legacy
JSON stacking order, max-rows cap, missing-file and empty-output refusal
(reference analog: scripts/extract_reference_features.py:1-65)."""

import json
import sys
import tempfile
import unittest
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import extract_reference_features  # noqa: E402

from mermaid_classifier_tpu.data.features_io import write_feature_file  # noqa: E402


def write_npz(path: Path, base: float, n: int = 3, dim: int = 4) -> np.ndarray:
    rowcols = np.stack([np.arange(n), np.arange(n) * 2], 1).astype(np.int32)
    features = (base + np.arange(n * dim).reshape(n, dim)).astype(np.float32)
    write_feature_file(path, rowcols, features)
    return features


def write_legacy(path: Path, base: float, n: int = 2, dim: int = 4) -> np.ndarray:
    features = (base + np.arange(n * dim).reshape(n, dim)).astype(np.float32)
    payload = {
        "point_features": [
            {"row": i, "col": i * 3, "data": features[i].tolist()}
            for i in range(n)
        ]
    }
    path.write_text(json.dumps(payload))
    return features


class TestExtractReferenceFeatures(unittest.TestCase):
    def test_stacks_npz_and_legacy_in_given_order(self):
        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            f1 = write_npz(tmp / "a.features.npz", base=0.0)
            f2 = write_legacy(tmp / "b.featurevector", base=100.0)
            out = tmp / "fixtures" / "ref.npy"
            rc = extract_reference_features.main(
                ["--output", str(out),
                 str(tmp / "a.features.npz"), str(tmp / "b.featurevector")]
            )
            self.assertEqual(rc, 0)
            stacked = np.load(out)
            self.assertEqual(stacked.dtype, np.float32)
            np.testing.assert_array_equal(stacked, np.vstack([f1, f2]))

    def test_max_rows_caps_output(self):
        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            write_npz(tmp / "a.features.npz", base=0.0, n=5)
            out = tmp / "ref.npy"
            rc = extract_reference_features.main(
                ["--output", str(out), "--max-rows", "2",
                 str(tmp / "a.features.npz")]
            )
            self.assertEqual(rc, 0)
            self.assertEqual(np.load(out).shape[0], 2)

    def test_missing_input_exits_1_without_output(self):
        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            out = tmp / "ref.npy"
            rc = extract_reference_features.main(
                ["--output", str(out), str(tmp / "nope.features.npz")]
            )
            self.assertEqual(rc, 1)
            self.assertFalse(out.exists())

    def test_refuses_empty_fixture(self):
        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            write_npz(tmp / "a.features.npz", base=0.0, n=0)
            out = tmp / "ref.npy"
            rc = extract_reference_features.main(
                ["--output", str(out), str(tmp / "a.features.npz")]
            )
            self.assertEqual(rc, 1)
            self.assertFalse(out.exists())


if __name__ == "__main__":
    unittest.main()
