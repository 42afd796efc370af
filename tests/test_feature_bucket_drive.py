"""The extraction-at-scale drive must prove kill/resume idempotence from a
fresh checkout, at smoke scale, on CPU: uninterrupted baseline build, a
SIGKILL'd second build, a skip-existing resume, and the byte-level
verification that the resume changed nothing and rewrote nothing
(reference discipline: scripts/build_feature_bucket.py:15-22,337-349).

The production-scale version of this exact flow runs on the chip via
``scripts/feature_bucket_drive.py`` and commits its record to docs/runs/
(schema pinned by tests/test_run_records.py)."""

import json
import sys
import tempfile
import unittest
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tests.common.e2e_harness import run_e2e  # noqa: E402


class TestFeatureBucketDrive(unittest.TestCase):
    def test_kill_resume_idempotence_smoke(self):
        with tempfile.TemporaryDirectory() as td:
            out_json = Path(td) / "record.json"
            proc = run_e2e(
                [
                    sys.executable,
                    str(REPO / "scripts" / "feature_bucket_drive.py"),
                    "--cpu",
                    "--images", "36",
                    "--points", "16",
                    "--sources", "3",
                    "--kill-frac", "0.35",
                    "--workdir", str(Path(td) / "work"),
                    "--output-json", str(out_json),
                ],
                cwd=REPO,
            )
            if proc.returncode != 0:
                self.fail(
                    f"drive failed (rc={proc.returncode})\n"
                    f"--- stdout ---\n{proc.stdout[-4000:]}\n"
                    f"--- stderr ---\n{proc.stderr[-4000:]}"
                )
            record = json.loads(out_json.read_text())
            self.assertTrue(record["ok"], record)
            kr = record["kill_resume"]
            self.assertTrue(kr["killed_mid_run"])
            self.assertEqual(kr["kill_signal"], "SIGKILL")
            # The kill landed mid-run: some images were done, not all.
            self.assertGreaterEqual(kr["done_before_resume"], 1)
            self.assertLess(kr["done_before_resume"], record["images_total"])
            self.assertTrue(kr["featsB_complete"])
            self.assertTrue(kr["identical_to_uninterrupted"])
            self.assertEqual(kr["rewrites_after_resume"], 0)
            self.assertEqual(kr["failures_logged"], 0)
            self.assertEqual(record["points_total"], 36 * 16)


if __name__ == "__main__":
    unittest.main()
