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


class TestCommittedSameCorpusRecord(unittest.TestCase):
    """The committed at-scale record (the C2 quality comparison's ground):
    same-corpus deltas must stay inside the stated band, and the record
    must keep characterizing the log-loss story it exists to settle."""

    RECORD = (
        REPO / "docs" / "runs" / "sklearn_same_corpus_baseline_2026-08-19.json"
    )

    def setUp(self):
        self.record = json.loads(self.RECORD.read_text())

    def test_same_corpus_deltas_within_band(self):
        delta = self.record["delta_repo_minus_sklearn"]
        # Stated bands (repo − sklearn, same corpus/subsample/splits):
        # accuracy within ±0.01 — the pipelines are at parity;
        # balanced accuracy must NOT be worse (the repo trains with
        # effective-number weights, whose whole point is this metric);
        # calibrated log_loss within +0.05 of the sklearn pipeline.
        self.assertLessEqual(abs(delta["accuracy"]), 0.01, delta)
        self.assertGreaterEqual(delta["balanced_accuracy"], 0.0, delta)
        self.assertLessEqual(delta["log_loss"], 0.05, delta)

    def test_log_loss_gap_characterized(self):
        # The VERDICT-r4 question: repo 0.902 vs reference-real-data 0.598.
        # The record must show the SAME-corpus sklearn calibrated log_loss
        # is itself far above 0.598 (a corpus property), and that prefit
        # sigmoid calibration is what raises it (uncalibrated < calibrated
        # at this scale) for the reference pipeline too.
        sk = self.record["sklearn"]
        raw = self.record["sklearn_uncalibrated"]
        self.assertGreater(sk["log_loss"], 0.8)
        self.assertLess(raw["log_loss"], sk["log_loss"])

    def test_record_is_the_drive_shape(self):
        corpus = self.record["corpus"]
        self.assertEqual(corpus["classes"], 80)
        self.assertEqual(corpus["dim"], 4096)
        self.assertGreater(corpus["train_points"], 300_000)
        es = self.record["early_stop"]
        self.assertEqual(es["stop_reason"], "early_stopping")
        self.assertEqual(len(es["epoch_history"]), es["final_epoch"])


if __name__ == "__main__":
    unittest.main()
