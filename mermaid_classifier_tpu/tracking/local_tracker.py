"""LocalTracker: filesystem experiment tracking.

The reference logs params/metrics/artifacts/models to an MLflow server
(reference: runner.py:254-722, utils.py:49-73, SURVEY.md §5.5). mlflow is not
available in this image, and a training framework should not require a
tracking server to function — so this is a first-party tracker with the same
capability surface, storing everything as plain files a human (or the report
generator) can read:

  <root>/<experiment>/<run_id>/
      meta.json            run name, experiment, status, timestamps
      params.json          flat params dict
      tags.json            tags
      metrics/<name>.jsonl one line per logged value: {step, value, time}
      artifacts/<path>     artifact tree (CSV/JSON/YAML/PNG/...)
  <root>/_models/<name>/v<N>/   registered model versions (copied files
                                + meta.json pointing back at the run)

Metric names may contain '/' (grouping separator, like MLflow's UI).
NaN scalar values are skipped with a warning — the same guard the reference
needed (reference: coordinator.py:89-96).
"""

from __future__ import annotations

import json
import math
import re
import shutil
import time
import uuid
from pathlib import Path
from typing import Any

from logging import getLogger

logger = getLogger(__name__)

_SAFE_SEGMENT = re.compile(r"[^A-Za-z0-9._=-]+")


def _safe_path_segment(name: str) -> str:
    return _SAFE_SEGMENT.sub("_", name)


def _jsonable(value: Any) -> Any:
    if isinstance(value, (str, int, float, bool)) or value is None:
        return value
    return str(value)


class Run:
    """One tracked run. Use as a context manager or call ``end()``."""

    def __init__(self, run_dir: Path, experiment: str, run_name: str, run_id: str):
        self.run_dir = run_dir
        self.run_id = run_id
        self.experiment = experiment
        self.run_name = run_name
        (run_dir / "metrics").mkdir(parents=True, exist_ok=True)
        (run_dir / "artifacts").mkdir(parents=True, exist_ok=True)
        self._params: dict[str, Any] = {}
        self._tags: dict[str, Any] = {}
        self._meta = {
            "run_id": run_id,
            "run_name": run_name,
            "experiment": experiment,
            "status": "RUNNING",
            "start_time": time.time(),
        }
        self._write_meta()

    # -- lifecycle -----------------------------------------------------------

    def _write_meta(self) -> None:
        (self.run_dir / "meta.json").write_text(json.dumps(self._meta, indent=2))

    def end(self, status: str = "FINISHED") -> None:
        self._meta["status"] = status
        self._meta["end_time"] = time.time()
        self._write_meta()

    def __enter__(self) -> "Run":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.end("FAILED" if exc_type is not None else "FINISHED")

    # -- params / tags ---------------------------------------------------------

    def log_param(self, key: str, value: Any) -> None:
        self._params[key] = _jsonable(value)
        (self.run_dir / "params.json").write_text(
            json.dumps(self._params, indent=2, sort_keys=True)
        )

    def log_params(self, params: dict[str, Any]) -> None:
        for k, v in params.items():
            self._params[k] = _jsonable(v)
        (self.run_dir / "params.json").write_text(
            json.dumps(self._params, indent=2, sort_keys=True)
        )

    def set_tag(self, key: str, value: Any) -> None:
        self._tags[key] = _jsonable(value)
        (self.run_dir / "tags.json").write_text(
            json.dumps(self._tags, indent=2, sort_keys=True)
        )

    # -- metrics ------------------------------------------------------------------

    def log_metric(self, name: str, value: float, step: int | None = None) -> None:
        value = float(value)
        if math.isnan(value) or math.isinf(value):
            logger.warning(
                "Skipping metric %r with non-finite value %r", name, value
            )
            return
        path = self.run_dir / "metrics" / (
            "/".join(_safe_path_segment(p) for p in name.split("/")) + ".jsonl"
        )
        path.parent.mkdir(parents=True, exist_ok=True)
        with path.open("a") as f:
            f.write(
                json.dumps({"step": step, "value": value, "time": time.time()}) + "\n"
            )

    def log_metrics(self, metrics: dict[str, float], step: int | None = None) -> None:
        for name, value in metrics.items():
            self.log_metric(name, value, step=step)

    # -- artifacts -----------------------------------------------------------------

    def _artifact_path(self, artifact_path: str) -> Path:
        path = (self.run_dir / "artifacts" / artifact_path).resolve()
        if not str(path).startswith(str((self.run_dir / "artifacts").resolve())):
            raise ValueError(f"artifact path escapes the run: {artifact_path!r}")
        path.parent.mkdir(parents=True, exist_ok=True)
        return path

    def log_dict(self, data: dict, artifact_path: str) -> None:
        path = self._artifact_path(artifact_path)
        if artifact_path.endswith((".yaml", ".yml")):
            import yaml

            path.write_text(yaml.safe_dump(data, sort_keys=False))
        else:
            path.write_text(json.dumps(data, indent=2, default=str))

    def log_text(self, text: str, artifact_path: str) -> None:
        self._artifact_path(artifact_path).write_text(text)

    def log_dataframe(self, df: Any, artifact_path: str) -> None:
        df.to_csv(self._artifact_path(artifact_path), index=False)

    def log_figure(self, fig: Any, artifact_path: str, **save_kwargs: Any) -> None:
        # Caller kwargs win over the tight-bbox default: a figure that
        # already ran tight_layout can skip the extra measuring draw
        # (bbox_inches=None) and cap its raster dpi.
        kwargs: dict[str, Any] = {"bbox_inches": "tight"}
        kwargs.update(save_kwargs)
        try:
            fig.savefig(self._artifact_path(artifact_path), **kwargs)
        finally:
            import matplotlib.pyplot as plt

            plt.close(fig)

    def log_artifact(self, local_path: str | Path, artifact_path: str | None = None) -> None:
        local_path = Path(local_path)
        dest = self._artifact_path(
            artifact_path if artifact_path else local_path.name
        )
        if artifact_path and not Path(artifact_path).suffix:
            dest = dest / local_path.name
            dest.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(local_path, dest)

    # -- read API (report generation) -------------------------------------------

    def params(self) -> dict[str, Any]:
        path = self.run_dir / "params.json"
        return json.loads(path.read_text()) if path.exists() else {}

    def metric_history(self, name: str) -> list[dict]:
        path = self.run_dir / "metrics" / (name + ".jsonl")
        if not path.exists():
            return []
        return [json.loads(line) for line in path.read_text().splitlines() if line]

    def latest_metrics(self) -> dict[str, float]:
        out: dict[str, float] = {}
        metrics_root = self.run_dir / "metrics"
        for path in sorted(metrics_root.rglob("*.jsonl")):
            name = str(path.relative_to(metrics_root))[: -len(".jsonl")]
            lines = path.read_text().splitlines()
            if lines:
                out[name] = json.loads(lines[-1])["value"]
        return out

    def artifact(self, artifact_path: str) -> Path:
        return self.run_dir / "artifacts" / artifact_path

    def list_artifacts(self) -> list[str]:
        root = self.run_dir / "artifacts"
        return sorted(
            str(p.relative_to(root)) for p in root.rglob("*") if p.is_file()
        )


class LocalTracker:
    """Tracker root; creates runs and registers models."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def start_run(
        self, experiment_name: str, run_name: str | None = None
    ) -> Run:
        run_id = uuid.uuid4().hex[:16]
        run_name = run_name or f"run-{run_id[:8]}"
        run_dir = self.root / _safe_path_segment(experiment_name) / run_id
        return Run(run_dir, experiment_name, run_name, run_id)

    def runs(self, experiment_name: str) -> list[Run]:
        exp_dir = self.root / _safe_path_segment(experiment_name)
        out = []
        if exp_dir.is_dir():
            for run_dir in sorted(exp_dir.iterdir()):
                meta_path = run_dir / "meta.json"
                if meta_path.is_file():
                    meta = json.loads(meta_path.read_text())
                    run = Run.__new__(Run)
                    run.run_dir = run_dir
                    run.run_id = meta["run_id"]
                    run.experiment = meta["experiment"]
                    run.run_name = meta["run_name"]
                    run._meta = meta
                    run._params = run.params()
                    run._tags = {}
                    out.append(run)
        # Chronological, not directory-name order: run ids are random hex,
        # and callers rely on runs[-1] being the LATEST run.
        out.sort(key=lambda r: r._meta.get("start_time", 0.0))
        return out

    def get_run(self, run_id: str) -> Run:
        for exp_dir in self.root.iterdir():
            if exp_dir.name == "_models" or not exp_dir.is_dir():
                continue
            run_dir = exp_dir / run_id
            if (run_dir / "meta.json").is_file():
                meta = json.loads((run_dir / "meta.json").read_text())
                run = Run.__new__(Run)
                run.run_dir = run_dir
                run.run_id = run_id
                run.experiment = meta["experiment"]
                run.run_name = meta["run_name"]
                run._meta = meta
                run._params = run.params()
                run._tags = {}
                return run
        raise KeyError(f"run {run_id!r} not found under {self.root}")

    # -- model registry ------------------------------------------------------------

    def register_model(
        self, name: str, files: list[str | Path], run: Run | None = None
    ) -> Path:
        """Register a new version of ``name`` from artifact files; returns
        the version directory (reference analog: mlflow_model.log_artifact_model)."""
        model_root = self.root / "_models" / _safe_path_segment(name)
        model_root.mkdir(parents=True, exist_ok=True)
        existing = [
            int(p.name[1:])
            for p in model_root.iterdir()
            if p.is_dir() and re.fullmatch(r"v\d+", p.name)
        ]
        version = max(existing, default=0) + 1
        version_dir = model_root / f"v{version}"
        version_dir.mkdir()
        for f in files:
            shutil.copy2(f, version_dir / Path(f).name)
        meta = {
            "name": name,
            "version": version,
            "run_id": run.run_id if run else None,
            "registered_at": time.time(),
        }
        (version_dir / "registry_meta.json").write_text(json.dumps(meta, indent=2))
        return version_dir

    def model_version(self, name: str, version: str) -> Path | None:
        """Directory of a specific registered version ('v<N>'), or None.
        Applies the same name sanitization as register_model."""
        if not re.fullmatch(r"v\d+", version):
            return None
        version_dir = self.root / "_models" / _safe_path_segment(name) / version
        return version_dir if version_dir.is_dir() else None

    def latest_model_version(self, name: str) -> Path | None:
        model_root = self.root / "_models" / _safe_path_segment(name)
        if not model_root.is_dir():
            return None
        versions = sorted(
            (
                int(p.name[1:])
                for p in model_root.iterdir()
                if p.is_dir() and re.fullmatch(r"v\d+", p.name)
            ),
        )
        return model_root / f"v{versions[-1]}" if versions else None


def get_default_tracker() -> LocalTracker:
    from mermaid_classifier_tpu.config.settings import settings

    root = settings.tracking_dir
    if not root:
        raise ValueError(
            "settings.tracking_dir is not set; configure TRACKING_DIR or pass"
            " a LocalTracker explicitly."
        )
    return LocalTracker(root)
