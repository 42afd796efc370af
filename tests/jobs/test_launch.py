"""Launcher tests: chunking, request construction, dry-run, local fan-out
(reference analog: tests/sagemaker_launcher/)."""

import sys
import textwrap
import unittest
from pathlib import Path

from mermaid_classifier_tpu.jobs import (
    DryRunBackend,
    JobStatus,
    LocalProcessBackend,
    build_processing_requests,
    chunk_items,
    launch_processing,
    parse_run_config,
    wait_for_completion,
)
from mermaid_classifier_tpu.jobs.backend import JobRequest
from mermaid_classifier_tpu.jobs.launch import build_training_request

import tempfile


class TestChunkItems(unittest.TestCase):
    def test_round_robin(self):
        self.assertEqual(
            chunk_items(["a", "b", "c", "d", "e"], 2),
            [["a", "c", "e"], ["b", "d"]],
        )

    def test_more_workers_than_items_drops_empty(self):
        self.assertEqual(chunk_items(["a"], 4), [["a"]])

    def test_single_worker(self):
        self.assertEqual(chunk_items(["a", "b"], 1), [["a", "b"]])


def write_run_config(tmp: Path, workers: int = 2) -> Path:
    (tmp / "sources.csv").write_text("source_id\n1\n2\n3\n")
    config = tmp / "run.yaml"
    config.write_text(textwrap.dedent(f"""\
        job:
          entrypoint: scripts/build_feature_bucket.py
          env: {{RUN_FLAG: "1"}}
          tags: {{team: mermaid}}
        processing:
          container_args: [--source-bucket, img, --target-bucket, feat]
          shard:
            items_csv: sources.csv
            workers: {workers}
            per_worker_arg: --source-ids
        """))
    return config


class TestRunConfig(unittest.TestCase):
    def test_strict_rejects_unknown_block(self):
        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            config = write_run_config(tmp)
            bad = tmp / "bad.yaml"
            bad.write_text(config.read_text() + "unknown_block: {}\n")
            with self.assertRaises(Exception):
                parse_run_config(bad, strict=True)
            # Loose parse ignores the unknown block (container-side).
            loose = parse_run_config(bad, strict=False)
            self.assertEqual(loose.processing.shard.workers, 2)

    def test_missing_items_csv_fails_at_request_build(self):
        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            config = write_run_config(tmp)
            (tmp / "sources.csv").unlink()
            parsed = parse_run_config(config)
            with self.assertRaises(FileNotFoundError):
                build_processing_requests(parsed, "run1")


class TestRequestConstruction(unittest.TestCase):
    def test_shard_requests(self):
        with tempfile.TemporaryDirectory() as td:
            config = parse_run_config(write_run_config(Path(td), workers=2))
            requests = build_processing_requests(config, "run1")
            self.assertEqual(len(requests), 2)
            self.assertEqual(requests[0].name, "run1-w0")
            self.assertEqual(requests[0].command[0], sys.executable)
            self.assertEqual(
                requests[0].command[1:],
                ["scripts/build_feature_bucket.py", "--source-bucket", "img",
                 "--target-bucket", "feat", "--source-ids", "1,3"],
            )
            self.assertEqual(requests[1].command[-1], "2")
            self.assertEqual(requests[0].env, {"RUN_FLAG": "1"})
            self.assertEqual(requests[0].tags["run_id"], "run1")

    def test_training_request(self):
        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            (tmp / "config").mkdir()
            (tmp / "config" / "training_config.yaml").write_text("{}")
            run_yaml = tmp / "run.yaml"
            run_yaml.write_text(textwrap.dedent("""\
                job:
                  entrypoint: scripts/train_job_entrypoint.py
                training:
                  config_dir: config
                """))
            config = parse_run_config(run_yaml)
            request = build_training_request(config, "run2")
            self.assertIn("--config-dir", request.command)
            self.assertIn(str(tmp / "config"), request.command)


class TestDryRun(unittest.TestCase):
    def test_dry_run_submits_nothing(self):
        with tempfile.TemporaryDirectory() as td:
            config = parse_run_config(write_run_config(Path(td)))
            backend = DryRunBackend()
            job_ids = launch_processing(config, backend, "run1", dry_run=True)
            self.assertEqual(job_ids, [])
            self.assertEqual(backend.requests, [])


class TestLocalBackend(unittest.TestCase):
    def test_fan_out_and_wait(self):
        backend = LocalProcessBackend()
        ok = backend.submit(JobRequest(
            name="ok", command=[sys.executable, "-c", "print('fine')"]))
        bad = backend.submit(JobRequest(
            name="bad", command=[sys.executable, "-c", "raise SystemExit(3)"]))
        statuses = wait_for_completion(
            backend, [ok, bad], poll_seconds=0.05, timeout_seconds=30
        )
        self.assertEqual(statuses[ok], JobStatus.COMPLETED)
        self.assertEqual(statuses[bad], JobStatus.FAILED)

    def test_env_propagates(self):
        with tempfile.TemporaryDirectory() as td:
            out = Path(td) / "out.txt"
            backend = LocalProcessBackend()
            job = backend.submit(JobRequest(
                name="env",
                command=[
                    sys.executable, "-c",
                    "import os,sys;"
                    f"open(r'{out}','w').write(os.environ['SHARD_FLAG'])",
                ],
                env={"SHARD_FLAG": "42"},
            ))
            wait_for_completion(backend, [job], poll_seconds=0.05,
                                timeout_seconds=30)
            self.assertEqual(out.read_text(), "42")


class TestStageConfigDir(unittest.TestCase):
    def test_uploads_tree(self):
        from mermaid_classifier_tpu.data.store import LocalFSObjectStore
        from mermaid_classifier_tpu.jobs.launch import stage_config_dir

        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            config = tmp / "config"
            (config / "sub").mkdir(parents=True)
            (config / "training_config.yaml").write_text("a: 1\n")
            (config / "sub" / "labels.csv").write_text("ba_id\nx\n")
            store = LocalFSObjectStore(tmp / "store")
            written = stage_config_dir(store, "staging", "run7", config)
            self.assertEqual(
                sorted(written),
                ["runs/run7/config/sub/labels.csv",
                 "runs/run7/config/training_config.yaml"],
            )
            self.assertEqual(
                store.get_bytes("staging", "runs/run7/config/training_config.yaml"),
                b"a: 1\n",
            )

    def test_missing_or_empty_dir(self):
        from mermaid_classifier_tpu.data.store import LocalFSObjectStore
        from mermaid_classifier_tpu.jobs.launch import stage_config_dir

        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            store = LocalFSObjectStore(tmp / "store")
            with self.assertRaises(FileNotFoundError):
                stage_config_dir(store, "b", "r", tmp / "nope")
            empty = tmp / "empty"
            empty.mkdir()
            with self.assertRaises(ValueError):
                stage_config_dir(store, "b", "r", empty)


if __name__ == "__main__":
    unittest.main()
