"""Launcher run-config YAML schema (reference analog:
mermaid_classifier/sagemaker/launcher_config.py:22-115).

Layout::

    job:
      entrypoint: scripts/build_feature_bucket.py
      env: {FEATURE_CACHE_DIR: /data/cache}
      tags: {team: mermaid}
    processing:                      # present for extraction fan-out runs
      container_args: [--source-bucket, reef-images, --target-bucket, reef-features]
      shard:
        items_csv: sources.csv       # sibling of this YAML
        workers: 4
        per_worker_arg: --source-ids
    training:                        # present for training runs
      config_dir: config/            # sibling of this YAML
      config_name: training_config.yaml

Strict vs loose parse (reference: launcher_config.py:69-115): the launcher
parses strict (``extra="forbid"`` everywhere, full validation); containers
re-parse loose (unknown blocks ignored) so one YAML serves both sides.
"""

from __future__ import annotations

from pathlib import Path

import yaml
from pydantic import BaseModel, ConfigDict, field_validator


class ShardSpec(BaseModel):
    model_config = ConfigDict(extra="forbid")
    items_csv: str
    workers: int = 1
    per_worker_arg: str = "--source-ids"

    @field_validator("workers")
    @classmethod
    def _positive_workers(cls, v: int) -> int:
        if v < 1:
            raise ValueError("workers must be >= 1")
        return v


class ProcessingSpec(BaseModel):
    model_config = ConfigDict(extra="forbid")
    container_args: list[str] = []
    shard: ShardSpec


class TrainingSpec(BaseModel):
    model_config = ConfigDict(extra="forbid")
    config_dir: str = "config"
    config_name: str = "training_config.yaml"
    container_args: list[str] = []


class ClusterBlock(BaseModel):
    """GKE/Kubernetes placement for cluster-backed runs (jobs/kubernetes.py).
    Absent -> local/dry-run backends only."""

    model_config = ConfigDict(extra="forbid")
    image: str
    namespace: str = "default"
    accelerator: str | None = None
    topology: str | None = None
    chips: int = 0
    cpu: str = "4"
    memory: str = "16Gi"
    spot: bool = False
    service_account: str | None = None
    active_deadline_seconds: int | None = None


class JobSpec(BaseModel):
    model_config = ConfigDict(extra="forbid")
    entrypoint: str
    env: dict[str, str] = {}
    tags: dict[str, str] = {}
    cluster: ClusterBlock | None = None


class RunConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    job: JobSpec
    processing: ProcessingSpec | None = None
    training: TrainingSpec | None = None

    # Set by parse_run_config; sibling paths resolve against it.
    config_dir: Path | None = None

    def resolve_sibling(self, filename: str) -> Path:
        base = self.config_dir or Path.cwd()
        resolved = (base / filename).resolve()
        if not resolved.exists():
            raise FileNotFoundError(
                f"run config references {filename!r} but {resolved} does not"
                " exist."
            )
        return resolved


class _LooseRunConfig(RunConfig):
    model_config = ConfigDict(extra="ignore")


def parse_run_config(path: str | Path, *, strict: bool = True) -> RunConfig:
    path = Path(path)
    data = yaml.safe_load(path.read_text())
    if not isinstance(data, dict):
        raise ValueError(f"run config {path} is not a YAML mapping.")
    cls = RunConfig if strict else _LooseRunConfig
    config = cls.model_validate(data)
    config.config_dir = path.parent.resolve()
    return config
