"""Failure-path tests for the job training entrypoint: staged
ENTER/FAIL/EXIT markers, exit codes, and env redaction
(reference analog: tests for sagemaker_train_entrypoint.py:47-56,167-172)."""

import logging
import sys
import unittest
from pathlib import Path
from unittest import mock

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import train_job_entrypoint  # noqa: E402


def write_minimal_config(tmp: Path) -> Path:
    config_dir = tmp / "config"
    config_dir.mkdir()
    (config_dir / "training_config.yaml").write_text(
        "training:\n  epochs: 2\n"
    )
    return config_dir


class RecordingRunner:
    """Stands in for TrackingTrainingRunner; records construction + run."""

    instances: list = []

    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.run_names: list = []
        type(self).instances.append(self)

    def run(self, run_name=None):
        self.run_names.append(run_name)


class CrashingRunner(RecordingRunner):
    def run(self, run_name=None):
        raise RuntimeError("boom in training")


class TestEntrypointStages(unittest.TestCase):
    def setUp(self):
        RecordingRunner.instances = []

    def run_main(self, argv, factory):
        with mock.patch.object(
            train_job_entrypoint, "_resolve_runner_factory", lambda: factory
        ):
            with self.assertLogs(train_job_entrypoint.logger, level="INFO") as logs:
                rc = train_job_entrypoint.main(argv)
        return rc, "\n".join(logs.output)

    def test_success_emits_enter_exit_for_every_stage(self):
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            config_dir = write_minimal_config(Path(td))
            rc, log = self.run_main(
                ["--config-dir", str(config_dir), "--run-name", "r1"],
                RecordingRunner,
            )
        self.assertEqual(rc, 0)
        for stage in ("load_config", "apply_env", "build_options", "runner_run"):
            self.assertIn(f"ENTER {stage}", log)
            self.assertIn(f"EXIT {stage}", log)
        self.assertNotIn("FAIL", log)
        (runner,) = RecordingRunner.instances
        self.assertEqual(runner.run_names, ["r1"])
        self.assertEqual(runner.kwargs["training_options"].epochs, 2)

    def test_runner_crash_marks_fail_and_exits_1(self):
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            config_dir = write_minimal_config(Path(td))
            rc, log = self.run_main(
                ["--config-dir", str(config_dir)], CrashingRunner
            )
        self.assertEqual(rc, 1)
        self.assertIn("ENTER runner_run", log)
        self.assertIn("FAIL runner_run", log)
        self.assertIn("boom in training", log)
        # Earlier stages completed cleanly.
        self.assertIn("EXIT build_options", log)

    def test_bad_config_fails_load_stage(self):
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            config_dir = Path(td) / "config"
            config_dir.mkdir()
            (config_dir / "training_config.yaml").write_text(
                "not_a_real_block: {}\n"
            )
            rc, log = self.run_main(
                ["--config-dir", str(config_dir)], RecordingRunner
            )
        self.assertEqual(rc, 1)
        self.assertIn("FAIL load_config", log)
        self.assertNotIn("ENTER apply_env", log)
        self.assertEqual(RecordingRunner.instances, [])

    def test_missing_config_dir_fails_load_stage(self):
        rc, log = self.run_main(
            ["--config-dir", "/nope/never/exists"], RecordingRunner
        )
        self.assertEqual(rc, 1)
        self.assertIn("does not exist", log)
        self.assertIn("FAIL load_config", log)


class TestDebugDumpRedaction(unittest.TestCase):
    def test_secretlike_env_values_are_redacted(self):
        import tempfile

        secrets = {
            "MY_API_KEY": "k123",
            "STORE_SECRET": "s456",
            "AUTH_TOKEN": "t789",
            "DB_PASSWORD": "p000",
            "GCP_CREDENTIALS": "c111",
        }
        with tempfile.TemporaryDirectory() as td, mock.patch.dict(
            "os.environ", {**secrets, "SAFE_FLAG": "visible"}
        ):
            logger = train_job_entrypoint.logger
            records = []
            handler = logging.Handler()
            handler.emit = lambda record: records.append(record.getMessage())
            logger.addHandler(handler)
            old_level = logger.level
            logger.setLevel(logging.DEBUG)
            try:
                train_job_entrypoint._debug_dump(Path(td))
            finally:
                logger.removeHandler(handler)
                logger.setLevel(old_level)
        dump = "\n".join(records)
        for key, value in secrets.items():
            self.assertIn(f"env {key}=<redacted>", dump)
            self.assertNotIn(value, dump)
        self.assertIn("env SAFE_FLAG=visible", dump)


if __name__ == "__main__":
    unittest.main()
