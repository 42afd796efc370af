"""The same-corpus sklearn baseline must run the reference-semantics pipeline
(reference trainer epoch loop + strict prefit sigmoid calibration —
reference: pyspacer/trainer.py:113-260,344-396) end to end from a fresh
checkout at smoke scale on CPU, consuming the drive-identical ETL ->
subsample -> split path, and emit the delta record the C2 quality comparison
rests on. The production-scale version runs once against the C2 drive's
corpus and commits its record to docs/runs/."""

import json
import sys
import tempfile
import unittest
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tests.common.e2e_harness import run_e2e  # noqa: E402


class TestSklearnReferenceBaseline(unittest.TestCase):
    def test_smoke_end_to_end(self):
        with tempfile.TemporaryDirectory() as td:
            out_json = Path(td) / "record.json"
            proc = run_e2e(
                [
                    sys.executable,
                    str(REPO / "scripts" / "sklearn_reference_baseline.py"),
                    "--workdir", str(Path(td) / "work"),
                    "--pool-rows", "3000",
                    "--classes", "10",
                    "--dim", "48",
                    "--points-per-image", "50",
                    "--sources", "3",
                    "--epochs", "6",
                    "--patience", "2",
                    "--stream-chunk", "1500",
                    "--output-json", str(out_json),
                ],
                cwd=REPO,
            )
            if proc.returncode != 0:
                self.fail(
                    f"baseline failed (rc={proc.returncode})\n"
                    f"--- stdout ---\n{proc.stdout[-4000:]}\n"
                    f"--- stderr ---\n{proc.stderr[-4000:]}"
                )
            # Strict prefit semantics: the FrozenEstimator fallback (a
            # 5-fold ensemble) must NOT have been taken.
            self.assertNotIn("falling back to", proc.stdout + proc.stderr)
            record = json.loads(out_json.read_text())
            self.assertEqual(record["corpus"]["classes"], 10)
            for side in ("sklearn", "sklearn_uncalibrated", "repo_c2_record"):
                for key in ("accuracy", "balanced_accuracy", "log_loss"):
                    self.assertIsNotNone(record[side][key], (side, key))
            # Calibration must actually calibrate: a partial-fit-driven MLP
            # this early is overconfident-or-underconfident enough that the
            # Platt pass moves log_loss down (the reference relies on this).
            self.assertLess(
                record["sklearn"]["log_loss"],
                record["sklearn_uncalibrated"]["log_loss"],
            )
            # The delta block diffs every shared metric.
            self.assertEqual(
                set(record["delta_repo_minus_sklearn"]),
                {"accuracy", "balanced_accuracy", "log_loss", "f1_macro",
                 "mcc"},
            )
            # The epoch loop honored the reference's early-stop contract.
            es = record["early_stop"]
            self.assertLessEqual(es["final_epoch"], 6)
            self.assertIsNotNone(es["best_val_epoch"])
            self.assertEqual(
                len(es["epoch_history"]), es["final_epoch"]
            )


if __name__ == "__main__":
    unittest.main()
