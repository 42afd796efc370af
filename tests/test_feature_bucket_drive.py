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
    def _drive(self, workdir: Path, out_json: Path, extra=()):
        proc = run_e2e(
            [
                sys.executable,
                str(REPO / "scripts" / "feature_bucket_drive.py"),
                "--cpu",
                "--images", "36",
                "--points", "16",
                "--sources", "3",
                "--kill-frac", "0.35",
                "--workdir", str(workdir),
                "--output-json", str(out_json),
                *extra,
            ],
            cwd=REPO,
        )
        if proc.returncode != 0:
            self.fail(
                f"drive failed (rc={proc.returncode})\n"
                f"--- stdout ---\n{proc.stdout[-4000:]}\n"
                f"--- stderr ---\n{proc.stderr[-4000:]}"
            )
        return json.loads(out_json.read_text())

    def _assert_proof_non_vacuous(self, record):
        self.assertTrue(record["ok"], record)
        kr = record["kill_resume"]
        self.assertTrue(kr["killed_mid_run"])
        self.assertEqual(kr["kill_signal"], "SIGKILL")
        # The kill landed mid-run: some images were done, not all. (On a
        # reused workdir this is also the anti-vacuity pin: stale bucket
        # outputs would make skip-existing no-op the build and the kill
        # fire on an already-complete bucket.)
        self.assertGreaterEqual(kr["done_before_resume"], 1)
        self.assertLess(kr["done_before_resume"], record["images_total"])
        self.assertTrue(kr["featsB_complete"])
        self.assertTrue(kr["identical_to_uninterrupted"])
        self.assertEqual(kr["rewrites_after_resume"], 0)
        self.assertEqual(kr["failures_logged"], 0)
        self.assertEqual(record["points_total"], 36 * 16)

    def test_kill_resume_idempotence_smoke(self):
        with tempfile.TemporaryDirectory() as td:
            workdir = Path(td) / "work"
            record = self._drive(workdir, Path(td) / "record.json")
            self._assert_proof_non_vacuous(record)

            # Rerun against the COMPLETED workdir with --skip-synthesize
            # (the documented A/B pattern): the drive must clear both
            # buckets despite reusing the corpus, or the uninterrupted
            # baseline no-ops, the kill/resume proof is vacuous, and an
            # ok=true record ships that proved nothing.
            rerun = self._drive(
                workdir, Path(td) / "rerun.json", ("--skip-synthesize",),
            )
            self._assert_proof_non_vacuous(rerun)
            self.assertLessEqual(
                rerun["stage_seconds"]["synthesize"], 5.0,
                "corpus was not reused on --skip-synthesize",
            )


if __name__ == "__main__":
    unittest.main()
