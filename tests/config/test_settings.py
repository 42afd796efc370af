"""Settings layer tests (reference analog: settings override fixtures in
tests/pyspacer/test_train.py:18-62)."""

import os

import pytest

from mermaid_classifier_tpu.config.settings import (
    FEATURE_DIM,
    Settings,
    apply_settings_to_env,
    override_settings,
    settings,
    training_batch_size,
)


class TestSettings:
    def test_defaults(self):
        s = Settings()
        assert s.training_inputs_percent_missing_allowed == 0
        assert s.download_max_workers == 50
        assert s.batch_size is None
        assert FEATURE_DIM == 4096

    def test_env_file_and_env_var_precedence(self, tmp_path, monkeypatch):
        env_file = tmp_path / ".env"
        env_file.write_text(
            "DOWNLOAD_MAX_WORKERS=7\nFEATURE_CACHE_DIR=/tmp/cache\n# comment\n"
        )
        s = Settings.from_env(env_file)
        assert s.download_max_workers == 7
        assert s.feature_cache_dir == "/tmp/cache"
        # OS env beats the file.
        monkeypatch.setenv("DOWNLOAD_MAX_WORKERS", "9")
        s2 = Settings.from_env(env_file)
        assert s2.download_max_workers == 9

    def test_invalid_env_value_fails_at_startup(self, tmp_path):
        env_file = tmp_path / ".env"
        env_file.write_text("BATCH_SIZE=not_a_number\n")
        with pytest.raises(Exception):
            Settings.from_env(env_file)

    def test_override_settings_restores(self):
        original = settings.download_max_workers
        with override_settings(download_max_workers=3):
            assert settings.download_max_workers == 3
        assert settings.download_max_workers == original

    def test_override_restores_on_exception(self):
        original = settings.download_max_workers
        with pytest.raises(RuntimeError):
            with override_settings(download_max_workers=1):
                raise RuntimeError("boom")
        assert settings.download_max_workers == original

    def test_apply_settings_to_env(self, monkeypatch):
        monkeypatch.delenv("MERMAID_TAXONOMY_FIXTURE_DIR", raising=False)
        with override_settings(taxonomy_fixture_dir="/tmp/tax"):
            apply_settings_to_env()
            assert os.environ["MERMAID_TAXONOMY_FIXTURE_DIR"] == "/tmp/tax"
        monkeypatch.delenv("MERMAID_TAXONOMY_FIXTURE_DIR", raising=False)


class TestTrainingBatchSize:
    def test_floor_and_memory_scaling(self):
        bs, available_gb = training_batch_size(num_classes=100)
        assert bs >= 5000
        assert available_gb > 0
        # More classes -> more activation memory -> never a larger batch.
        bs_many, _ = training_batch_size(num_classes=5000)
        assert bs_many <= bs
