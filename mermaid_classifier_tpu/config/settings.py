"""Environment-driven settings.

Rebuild of the reference's pydantic .env settings layer
(reference: mermaid_classifier/pyspacer/settings.py:61-161) on plain pydantic
(pydantic-settings is not available in this image): lowercase field names in
code, UPPERCASE env vars, optional ``.env`` file in the working directory,
and — critically — NO import-time side effects beyond reading the
environment. Forwarding settings into other packages' env vars happens only
through the explicit ``apply_settings_to_env()`` call, a discipline the
reference adopted deliberately (reference: settings.py:119-161 and the
runner's explicit calls).

Also carries the memory-aware auto batch size for head training
(reference: settings.py:17-58): the head streams 4096-float64 feature rows
through host RAM regardless of where the matmuls run, so the batch budget is
a host-RAM model — unchanged on TPU.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from pathlib import Path

import psutil
from pydantic import BaseModel, ConfigDict

# Feature-vector geometry (production contract; reference: settings.py:7-8).
FEATURE_DIM = 4096
_BYTES_PER_FLOAT = 8
_FEATURE_BYTES = FEATURE_DIM * _BYTES_PER_FLOAT
_MIN_BATCH_SIZE = 5000


def training_batch_size(num_classes: int = 300) -> tuple[int, float]:
    """Batch size from *currently available* host RAM.

    Call after data prep so psutil sees what the OS actually has free. The
    per-point cost model: the float64 feature row, one defensive full copy,
    and double-width activation buffers for the fixed (500, 300, 100)
    production head plus the output layer. 20% headroom, floor 5000.
    Returns (batch_size, available_gb) for logging
    (reference: settings.py:17-58).
    """
    available_bytes = psutil.virtual_memory().available
    available_gb = available_bytes / 1e9

    activation_units = 500 + 300 + 100 + num_classes
    bytes_per_point = (
        _FEATURE_BYTES  # row loaded from disk
        + _FEATURE_BYTES  # defensive C-contiguous copy
        + 2 * activation_units * _BYTES_PER_FLOAT  # fwd+bwd activations
    )
    usable = available_bytes * 0.80
    return max(int(usable / bytes_per_point), _MIN_BATCH_SIZE), available_gb


def _read_env_file(path: str | Path = ".env") -> dict[str, str]:
    """Minimal KEY=VALUE .env parser ('#' comments, optional quotes)."""
    path = Path(path)
    if not path.is_file():
        return {}
    values: dict[str, str] = {}
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, value = line.partition("=")
        value = value.strip().strip("'\"")
        values[key.strip()] = value
    return values


class Settings(BaseModel):
    """All knobs. Field names lowercase here, UPPERCASE in env/.env."""

    model_config = ConfigDict(validate_assignment=True)

    # -- ML inputs -----------------------------------------------------------
    coralnet_train_data_bucket: str = "coral-reef-training"
    mermaid_train_data_bucket: str = "coral-reef-training"
    # Store-relative patterns; placeholders filled via .format() when present
    # (overridable so tests can point the ETL at fixture files —
    # reference: settings.py:78-83).
    coralnet_annotations_csv_pattern: str = (
        "{coralnet_train_data_bucket}/s{source_id}/annotations.csv"
    )
    mermaid_annotations_parquet_pattern: str = (
        "{mermaid_train_data_bucket}/mermaid/mermaid_confirmed_annotations.parquet"
    )
    # Backbone weights bundle (npz) path/URI; None -> seeded-random weights.
    weights_location: str | None = None

    # -- object store ----------------------------------------------------------
    # Root for the local-filesystem object store backend. Bucket names become
    # directories under this root. None -> a store must be injected.
    object_store_root: str | None = None

    # -- taxonomy ----------------------------------------------------------------
    # Directory of taxonomy fixture JSONs for offline runs; None -> live API.
    taxonomy_fixture_dir: str | None = None

    # -- training -----------------------------------------------------------------
    training_inputs_percent_missing_allowed: int = 0
    # Override for the auto batch size; None -> training_batch_size().
    batch_size: int | None = None
    feature_cache_dir: str | None = None
    download_max_workers: int = 50
    # Pack train/ref/val features into flat caches once per run and stream
    # batches via native row gathers (native/fastbatch). Trades one extra
    # on-disk copy of the features for epoch loops free of per-image file
    # opens; batches are byte-identical either way.
    use_packed_feature_cache: bool = True
    # Data-parallel head training over an N-device mesh; None = one device.
    train_mesh_devices: int | None = None

    # -- extraction ----------------------------------------------------------------
    extractor_backbone_batch: int = 128
    extractor_point_bucket: int = 32
    extractor_image_bucket: int = 256

    # -- tracking ------------------------------------------------------------------
    # Local experiment-tracking root directory (the MLflow-server analog).
    tracking_dir: str | None = None
    default_experiment_name: str | None = None
    # When set, finished runs mirror into this object-store bucket
    # (tracking/store_sync.py) — remote tracking over the store plane.
    tracking_sync_bucket: str | None = None

    # -- compilation ---------------------------------------------------------------
    # Persistent XLA compilation cache directory; huge win for the slow
    # first-compile on the tunneled TPU.
    jax_compilation_cache_dir: str | None = None

    @classmethod
    def from_env(cls, env_file: str | Path = ".env") -> "Settings":
        file_values = _read_env_file(env_file)
        kwargs = {}
        for name, field in cls.model_fields.items():
            env_name = name.upper()
            if env_name in os.environ:
                kwargs[name] = os.environ[env_name]
            elif env_name in file_values:
                kwargs[name] = file_values[env_name]
        return cls(**kwargs)


settings = Settings.from_env()


def reload_settings_from_env(env_file: str | Path = ".env") -> Settings:
    """Re-read the environment into the EXISTING settings object, in place.

    Scripts apply their config's env: block and then call this; updating in
    place (never rebinding the module global) keeps every module that did
    ``from settings import settings`` seeing the refreshed values.
    """
    fresh = Settings.from_env(env_file)
    for name in Settings.model_fields:
        setattr(settings, name, getattr(fresh, name))
    return settings


def apply_settings_to_env() -> None:
    """Forward settings into the env vars other layers read. Explicit call,
    never an import side effect (reference: settings.py:119-161)."""
    if settings.taxonomy_fixture_dir:
        os.environ["MERMAID_TAXONOMY_FIXTURE_DIR"] = settings.taxonomy_fixture_dir
    if settings.jax_compilation_cache_dir:
        os.environ["JAX_COMPILATION_CACHE_DIR"] = settings.jax_compilation_cache_dir
        try:
            import jax

            jax.config.update(
                "jax_compilation_cache_dir", settings.jax_compilation_cache_dir
            )
        except Exception:  # noqa: BLE001 - jax may not be importable in pure-ETL venv
            pass


@contextmanager
def override_settings(**overrides):
    """Test helper: temporarily replace settings fields, copy/restore
    (reference analog: tests/pyspacer/test_train.py:18-62)."""
    saved = {name: getattr(settings, name) for name in overrides}
    try:
        for name, value in overrides.items():
            setattr(settings, name, value)
        yield settings
    finally:
        for name, value in saved.items():
            setattr(settings, name, value)
