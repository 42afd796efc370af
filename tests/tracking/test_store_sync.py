"""Store-synced tracking tests: push a finished run, discover it remotely,
pull it on a 'different machine', and generate the report from the pulled
copy — remote tracking with the store as the only shared plane."""

import unittest
from pathlib import Path

from mermaid_classifier_tpu.data.store import LocalFSObjectStore
from mermaid_classifier_tpu.tracking.local_tracker import LocalTracker
from mermaid_classifier_tpu.tracking.store_sync import (
    list_remote_runs,
    pull_run_from_store,
    sync_run_to_store,
    sync_tracker_to_store,
)


def finished_run(root: Path):
    tracker = LocalTracker(root)
    with tracker.start_run("exp-a", "run-one") as run:
        run.log_params({"epochs": 3, "lr": 1e-4})
        run.log_metric("accuracy", 0.91)
        run.log_metric("accuracy", 0.95, step=1)
        run.log_dict({"classes": ["a", "b"]}, "labels.json")
        run.log_text("hello", "notes/readme.txt")
    return tracker, run


class TestSyncAndPull(unittest.TestCase):
    def test_round_trip_between_machines(self):
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            tracker, run = finished_run(tmp / "machine_a")
            store = LocalFSObjectStore(tmp / "store")

            written = sync_run_to_store(run, store, "trk")
            self.assertTrue(
                any(k.endswith("meta.json") for k in written)
            )
            self.assertTrue(
                any("metrics/accuracy.jsonl" in k for k in written)
            )

            # Discovery from the bucket alone.
            runs = list_remote_runs(store, "trk")
            self.assertEqual(runs, {"exp-a": [run.run_id]})

            # 'Machine B' pulls and reads the same numbers.
            pulled = pull_run_from_store(
                store, "trk", "exp-a", run.run_id, tmp / "machine_b"
            )
            self.assertEqual(pulled.latest_metrics()["accuracy"], 0.95)
            self.assertEqual(pulled.params()["epochs"], 3)
            self.assertEqual(
                pulled.artifact("notes/readme.txt").read_text(), "hello"
            )

    def test_sync_is_idempotent_and_incremental(self):
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            tracker, run = finished_run(tmp / "a")
            store = LocalFSObjectStore(tmp / "store")
            first = sync_run_to_store(run, store, "trk")
            second = sync_run_to_store(run, store, "trk")
            self.assertGreater(len(first), 0)
            self.assertEqual(second, [])  # nothing new to upload

    def test_full_tracker_sync_includes_registry(self):
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            tracker, run = finished_run(tmp / "a")
            model = tmp / "model.npz"
            model.write_bytes(b"weights")
            manifest = tmp / "model.json"
            manifest.write_text("{}")
            tracker.register_model("mermaid-mlp", [model, manifest], run=run)
            store = LocalFSObjectStore(tmp / "store")
            written = sync_tracker_to_store(tracker, store, "trk")
            self.assertTrue(
                any("_models/mermaid-mlp/v1/model.npz" in k for k in written)
            )

    def test_pull_refuses_overwrite_by_default(self):
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            tracker, run = finished_run(tmp / "a")
            store = LocalFSObjectStore(tmp / "store")
            sync_run_to_store(run, store, "trk")
            pull_run_from_store(store, "trk", "exp-a", run.run_id, tmp / "b")
            with self.assertRaises(FileExistsError):
                pull_run_from_store(
                    store, "trk", "exp-a", run.run_id, tmp / "b"
                )
            pull_run_from_store(
                store, "trk", "exp-a", run.run_id, tmp / "b", overwrite=True
            )

    def test_report_generates_from_pulled_run(self):
        """The HTML report works against a pulled run — full remote
        observability without a tracking server."""
        import tempfile

        from mermaid_classifier_tpu.tracking.report import generate_report

        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            tracker, run = finished_run(tmp / "a")
            store = LocalFSObjectStore(tmp / "store")
            sync_run_to_store(run, store, "trk")
            pulled = pull_run_from_store(
                store, "trk", "exp-a", run.run_id, tmp / "b"
            )
            out = tmp / "report.html"
            generate_report(pulled, out)
            html = out.read_text()
            self.assertIn("accuracy", html)


if __name__ == "__main__":
    unittest.main()
