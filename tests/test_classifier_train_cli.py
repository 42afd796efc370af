"""classifier_train CLI tests with a patched runner factory, so the script
is testable without the training stack (reference analog:
tests/test_classifier_train.py + classifier_train.py:62-66)."""

import importlib.util
import sys
import tempfile
import textwrap
import unittest
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "classifier_train_cli", REPO_ROOT / "scripts" / "classifier_train.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


class _FakeReturnMsg:
    acc = 0.91


class _FakeRunner:
    instances: list = []

    def __init__(self, **kwargs):
        self.kwargs = kwargs
        _FakeRunner.instances.append(self)

    def run(self, run_name=None):
        self.run_name = run_name
        return _FakeReturnMsg(), Path("/fake/registry/v1")


class TestClassifierTrainCli(unittest.TestCase):
    def setUp(self):
        _FakeRunner.instances = []
        # The script configures root logging (console + debug file); stub it
        # out so the suite's logging state is untouched.
        import mermaid_classifier_tpu.utils.logging_config as lc

        self._real_logging_config = lc.logging_config_for_script
        lc.logging_config_for_script = lambda *a, **k: Path("/dev/null")
        # Snapshot process-global state the script legitimately mutates
        # (env block + in-place settings reload) and restore it after.
        import os

        import mermaid_classifier_tpu.config.settings as settings_mod

        self._env_snapshot = dict(os.environ)
        self._settings_snapshot = {
            name: getattr(settings_mod.settings, name)
            for name in settings_mod.Settings.model_fields
        }

    def tearDown(self):
        import os

        import mermaid_classifier_tpu.config.settings as settings_mod
        import mermaid_classifier_tpu.utils.logging_config as lc

        lc.logging_config_for_script = self._real_logging_config
        os.environ.clear()
        os.environ.update(self._env_snapshot)
        for name, value in self._settings_snapshot.items():
            setattr(settings_mod.settings, name, value)

    def _config_dir(self, tmp: Path) -> Path:
        config_dir = tmp / "config"
        config_dir.mkdir()
        (config_dir / "training_config.yaml").write_text(textwrap.dedent("""\
            dataset:
              include_mermaid: true
            training:
              epochs: 7
              early_stopping_patience: 2
            tracking:
              experiment_name: cli-test
            env:
              CLI_TEST_FLAG: "on"
            """))
        return config_dir

    def test_config_flows_to_runner(self):
        import os

        mod = _load_script()
        mod._resolve_runner_factory = lambda: _FakeRunner
        with tempfile.TemporaryDirectory() as td:
            config_dir = self._config_dir(Path(td))
            cwd = os.getcwd()
            os.chdir(td)  # logging helper writes logs/ relative to cwd
            try:
                rc = mod.main(
                    ["--config-dir", str(config_dir), "--run-name", "cli-run"]
                )
            finally:
                os.chdir(cwd)
        self.assertEqual(rc, 0)
        self.assertEqual(len(_FakeRunner.instances), 1)
        runner = _FakeRunner.instances[0]
        self.assertEqual(runner.kwargs["training_options"].epochs, 7)
        self.assertEqual(
            runner.kwargs["training_options"].early_stopping_patience, 2
        )
        self.assertEqual(
            runner.kwargs["tracking_options"].experiment_name, "cli-test"
        )
        self.assertEqual(runner.run_name, "cli-run")
        # env block applied before the runner ran.
        import os as _os

        self.assertEqual(_os.environ.get("CLI_TEST_FLAG"), "on")

    def test_missing_config_errors(self):
        mod = _load_script()
        mod._resolve_runner_factory = lambda: _FakeRunner
        with tempfile.TemporaryDirectory() as td:
            with self.assertRaises(Exception):
                mod.main(["--config-dir", td])  # no training_config.yaml


if __name__ == "__main__":
    unittest.main()
