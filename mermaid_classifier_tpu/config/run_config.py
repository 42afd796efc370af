"""TrainingRunConfig: the committed-YAML schema driving training runs.

Rebuild of the reference's SageMaker training-config schema
(reference: mermaid_classifier/sagemaker/config.py:26-229). The same YAML
config dir is the single source of truth for local and remote runs
(reference: scripts/classifier_train.py:1-21). Contracts preserved:

- ``extra="forbid"`` everywhere: removed/typo'd fields fail at load;
- CSV paths resolve relative to the YAML's own directory;
- the ``env:`` block applies to os.environ BEFORE heavy imports via an
  explicit ``apply_env()`` call;
- model-name shape is validated at load (fail fast, not at registration);
- ``build_options()`` materializes the three option dataclasses with lazy
  imports, so loading a config never imports jax.

YAML layout::

    dataset:
      coralnet_manifest_uri: ...
      include_mermaid: true
      drop_growthforms: false
      label_rollup_spec_csv: rollups.csv        # sibling of this YAML
      included_labels_csv: included_labels.csv
      ref_val_ratios: [0.1, 0.1]
      subsample: {strategy: balanced, total_annotations: 500000, min_per_class: 200}
      weighting: {enabled: true, weight_ratio_cap: 5000}
    training:
      epochs: 40
      early_stopping_patience: 3
    tracking:
      experiment_name: prod
      model_name: mermaid-mlp-prod
    env:
      FEATURE_CACHE_DIR: /data/features
"""

from __future__ import annotations

import os
import re
from pathlib import Path

import yaml
from pydantic import BaseModel, ConfigDict, field_validator

_MODEL_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")


class SubsampleConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    strategy: str = "stratified"
    total_annotations: int
    min_per_class: int = 0


class WeightingConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    enabled: bool = True
    weight_ratio_cap: float | None = None


class DatasetConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    include_mermaid: bool = True
    coralnet_manifest_uri: str | None = None
    drop_growthforms: bool = False
    label_rollup_spec_csv: str | None = None
    included_labels_csv: str | None = None
    excluded_labels_csv: str | None = None
    ref_val_ratios: tuple[float, float] = (0.1, 0.1)
    subsample: SubsampleConfig | None = None
    weighting: WeightingConfig | None = None


class TrainingConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    epochs: int = 10
    early_stopping_patience: int | None = None
    checkpoint_dir: str | None = None
    device_resident: bool = False
    resident_dtype: str = "float32"
    calibration_backend: str = "scipy"
    calibration_method: str = "sigmoid"

    @field_validator("resident_dtype")
    @classmethod
    def _validate_resident_dtype(cls, value: str) -> str:
        # Fail at config load, not after the multi-GB feature load
        # (same discipline as model_name below).
        if value not in ("float32", "bfloat16", "int8"):
            raise ValueError(
                f"resident_dtype must be 'float32', 'bfloat16' or 'int8',"
                f" got {value!r}"
            )
        return value

    @field_validator("calibration_backend")
    @classmethod
    def _validate_calibration_backend(cls, value: str) -> str:
        if value not in ("scipy", "device"):
            raise ValueError(
                f"calibration_backend must be 'scipy' or 'device', got"
                f" {value!r}"
            )
        return value

    @field_validator("calibration_method")
    @classmethod
    def _validate_calibration_method(cls, value: str) -> str:
        if value not in ("sigmoid", "temperature"):
            raise ValueError(
                f"calibration_method must be 'sigmoid' or 'temperature',"
                f" got {value!r}"
            )
        return value


class TrackingConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    experiment_name: str | None = None
    model_name: str | None = None
    extra_annotations_to_log: str | None = None

    @field_validator("model_name")
    @classmethod
    def _validate_model_name(cls, value: str | None) -> str | None:
        # Fail at config load, not after an hour of training
        # (reference: sagemaker/config.py:26-133).
        if value is not None and not _MODEL_NAME_RE.fullmatch(value):
            raise ValueError(
                f"model_name {value!r} must match {_MODEL_NAME_RE.pattern}"
            )
        return value


class TrainingRunConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    dataset: DatasetConfig = DatasetConfig()
    training: TrainingConfig = TrainingConfig()
    tracking: TrackingConfig = TrackingConfig()
    env: dict[str, str] = {}
    # Set by from_yaml_path; sibling-CSV resolution anchors here.
    config_dir: Path | None = None

    @classmethod
    def from_yaml_path(cls, path: str | Path) -> "TrainingRunConfig":
        path = Path(path)
        payload = yaml.safe_load(path.read_text()) or {}
        config = cls(**payload)
        config.config_dir = path.parent.resolve()
        return config

    def _resolve_sibling(self, filename: str | None) -> str | None:
        """CSV paths are siblings of the YAML (reference: config.py:71-95)."""
        if filename is None:
            return None
        if os.path.isabs(filename):
            return filename
        assert self.config_dir is not None, "load via from_yaml_path first"
        resolved = self.config_dir / filename
        if not resolved.is_file():
            raise FileNotFoundError(
                f"config references {filename!r} but {resolved} does not exist."
            )
        return str(resolved)

    def apply_env(self) -> None:
        """Apply the env block to os.environ. Call BEFORE heavy imports
        (reference: config.py:154-162)."""
        for key, value in self.env.items():
            os.environ[key] = str(value)

    def build_options(self):
        """Materialize (DatasetOptions, TrainingOptions, TrackingOptions).
        Imports are lazy so config loading stays lightweight."""
        from mermaid_classifier_tpu.config.options import (
            DatasetOptions,
            TrackingOptions,
            TrainingOptions,
        )
        from mermaid_classifier_tpu.data.subsample import SubsampleOptions
        from mermaid_classifier_tpu.train.class_weights import SampleWeightingOptions

        subsample = None
        if self.dataset.subsample is not None:
            subsample = SubsampleOptions(
                strategy=self.dataset.subsample.strategy,
                total_annotations=self.dataset.subsample.total_annotations,
                min_per_class=self.dataset.subsample.min_per_class,
            )
        weighting = None
        if self.dataset.weighting is not None:
            weighting = SampleWeightingOptions(
                enabled=self.dataset.weighting.enabled,
                weight_ratio_cap=self.dataset.weighting.weight_ratio_cap,
            )
        dataset_options = DatasetOptions(
            include_mermaid=self.dataset.include_mermaid,
            coralnet_manifest_uri=self.dataset.coralnet_manifest_uri,
            drop_growthforms=self.dataset.drop_growthforms,
            label_rollup_spec_csv=self._resolve_sibling(
                self.dataset.label_rollup_spec_csv
            ),
            included_labels_csv=self._resolve_sibling(self.dataset.included_labels_csv),
            excluded_labels_csv=self._resolve_sibling(self.dataset.excluded_labels_csv),
            ref_val_ratios=tuple(self.dataset.ref_val_ratios),
            subsample=subsample,
            weighting=weighting,
        )
        training_options = TrainingOptions(
            epochs=self.training.epochs,
            early_stopping_patience=self.training.early_stopping_patience,
            checkpoint_dir=self.training.checkpoint_dir,
            device_resident=self.training.device_resident,
            resident_dtype=self.training.resident_dtype,
            calibration_backend=self.training.calibration_backend,
            calibration_method=self.training.calibration_method,
        )
        tracking_options = TrackingOptions(
            experiment_name=self.tracking.experiment_name,
            model_name=self.tracking.model_name,
            extra_annotations_to_log=self.tracking.extra_annotations_to_log,
        )
        return dataset_options, training_options, tracking_options
