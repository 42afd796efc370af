"""Training runners: orchestration from options to a registered artifact.

- ``TrainingRunner``: tracker-free base — dataset build, auto batch size,
  class weights, trainer call (reference: runner.py:56-251). Usable as-is in
  tests and simple scripts.
- ``TrackingTrainingRunner``: full experiment lifecycle — params, system
  metrics sampling, per-epoch step metrics, dataset artifacts, and the
  eval-the-artifact ordering: export the deployable npz artifact parity-gated
  on the first real val batch, reload it with the public loader, and compute
  ALL metrics against the SHIPPED predictor (reference: runner.py:254-722).
"""

from __future__ import annotations

import os
import tempfile
import typing
from contextlib import contextmanager
from datetime import datetime
from logging import getLogger
from pathlib import Path

import pandas as pd

from mermaid_classifier_tpu.common.taxonomy import (
    get_benthic_attribute_library,
    get_growth_form_library,
)
from mermaid_classifier_tpu.config.options import (
    DatasetOptions,
    TrackingOptions,
    TrainingOptions,
)
from mermaid_classifier_tpu.config.settings import (
    apply_settings_to_env,
    settings,
    training_batch_size,
)
from mermaid_classifier_tpu.data.dataset import TrainingDataset
from mermaid_classifier_tpu.inference import export_artifact, load_predictor
from mermaid_classifier_tpu.metrics import MetricsContext, MetricsCoordinator
from mermaid_classifier_tpu.tracking.local_tracker import LocalTracker, Run
from mermaid_classifier_tpu.train.class_weights import compute_class_weights
from mermaid_classifier_tpu.train.trainer import MermaidTrainer
from mermaid_classifier_tpu.utils.profiling import section_profiling
from mermaid_classifier_tpu.utils.system_metrics import SystemMetricsSampler

logger = getLogger(__name__)


class TrainingRunner:
    """Tracker-free base runner (reference: runner.py:56-251)."""

    dataset: TrainingDataset | None = None

    def __init__(
        self,
        dataset_options: DatasetOptions | None = None,
        training_options: TrainingOptions | None = None,
        store: typing.Any = None,
    ):
        # Explicit env normalization at the programmatic entry point — never
        # an import side effect (reference: runner.py:76-80).
        apply_settings_to_env()
        self.dataset_options = dataset_options or DatasetOptions()
        self.training_options = training_options or TrainingOptions()
        self.store = store
        self.profiled_sections: list[dict] = []
        self._weighting_log: dict = {"enabled": False}

    def run(self, run_name: str | None = None, cleanup_dataset: bool = True):
        if run_name is None:
            run_name = self.current_time_str()
        logger.info("Run: %s", run_name)
        try:
            self.dataset = TrainingDataset(self.dataset_options, store=self.store)
            self.profiled_sections = self.dataset.profiled_sections.copy()

            with self.section_profiling("Logging dataset artifacts"):
                self.log_dataset_artifacts()

            logger.info("Proceeding to train with:")
            logger.info(self.dataset.describe_train_summary_stats())

            num_classes = len(self.dataset.labels.ref.classes_set)
            if settings.batch_size is not None:
                batch_size = settings.batch_size
                logger.info("Batch size: %d (from BATCH_SIZE)", batch_size)
            else:
                batch_size, available_gb = training_batch_size(num_classes=num_classes)
                logger.info(
                    "Batch size: %d (auto, %.1f GB available, %d classes)",
                    batch_size,
                    available_gb,
                    num_classes,
                )

            class_weight, self._weighting_log = self._compute_class_weights(
                self.dataset.labels
            )

            trainer = self._make_trainer(batch_size, class_weight)
            with self.section_profiling("Training call"):
                clf_calibrated, val_results, return_msg = trainer(
                    self.dataset.labels, self.training_options.epochs, []
                )
            self._early_stop_info = trainer._early_stop_info
            self._resident_timings = getattr(trainer, "resident_timings", None)
            # Kept for the eval-the-artifact fast path: the trainer knows
            # the resident split offsets, so metrics can gather the val
            # span on device instead of re-reading it from disk.
            self._trainer = trainer

            logger.info("Train time: %.1f s", return_msg.runtime)
            logger.info("New model's accuracy: %s", self.format_metric(return_msg.acc))
            return return_msg, clf_calibrated, val_results
        finally:
            if cleanup_dataset and self.dataset is not None:
                self.dataset.cleanup()
            packed = getattr(self, "_packed_cache_dir", None)
            if packed is not None and os.path.isdir(packed):
                import shutil

                shutil.rmtree(packed, ignore_errors=True)

    def _make_trainer(self, batch_size: int, class_weight) -> MermaidTrainer:
        """Hook so tests can shrink the head architecture."""
        packed_dir = None
        device_resident = getattr(
            self.training_options, "device_resident", False
        )
        # The packed cache accelerates DISK-streamed epochs (native row
        # gathers instead of per-image npz reads). A device-resident run
        # streams nothing from disk after the one-time upload, so packing
        # would rewrite the whole corpus (train+ref+val, ~7.4 GB at
        # production scale) for zero benefit — skip it.
        if settings.use_packed_feature_cache and not device_resident:
            self._packed_cache_dir = tempfile.mkdtemp(prefix="packed_cache_")
            packed_dir = self._packed_cache_dir
        return MermaidTrainer(
            batch_size=batch_size,
            on_epoch_end=self._on_epoch_end,
            class_weight=class_weight,
            early_stopping_patience=self.training_options.early_stopping_patience,
            packed_cache_dir=packed_dir,
            checkpoint_dir=getattr(self.training_options, "checkpoint_dir", None),
            mesh=self._make_training_mesh(),
            device_resident=getattr(
                self.training_options, "device_resident", False
            ),
            resident_dtype=getattr(
                self.training_options, "resident_dtype", "float32"
            ),
            calibration_backend=getattr(
                self.training_options, "calibration_backend", "scipy"
            ),
            calibration_method=getattr(
                self.training_options, "calibration_method", "sigmoid"
            ),
        )

    def _make_training_mesh(self):
        if settings.train_mesh_devices is None:
            return None
        from mermaid_classifier_tpu.parallel.mesh import make_mesh

        # Pure data parallelism for the head: batch over every device.
        return make_mesh(settings.train_mesh_devices, model_parallel=1)

    def _on_epoch_end(self, metrics: dict) -> None:
        """Override for logging."""

    def _compute_class_weights(
        self, labels
    ) -> tuple[dict[str, float] | None, dict]:
        """Effective-number weights from training-set class counts + the log
        table the tracking runner persists (reference: runner.py:159-228)."""
        opts = self.dataset_options.weighting
        if opts is None or not opts.enabled:
            return None, {"enabled": False}

        class_counts = labels.train.label_count_per_class
        weights = compute_class_weights(class_counts=class_counts, options=opts)

        per_class_df = pd.DataFrame(
            [
                {
                    "bagf_id": cls,
                    "count": int(count),
                    "weight": float(weights.get(cls, 0.0)),
                }
                for cls, count in class_counts.items()
            ]
        )
        weight_series = per_class_df["weight"]
        if len(weight_series) > 0 and weight_series.max() > 0:
            summary = {
                "weight_mean": float(weight_series.mean()),
                "weight_median": float(weight_series.median()),
                "weight_p5": float(weight_series.quantile(0.05)),
                "weight_p95": float(weight_series.quantile(0.95)),
                "weight_max_min_ratio": float(
                    weight_series.max() / max(weight_series.min(), 1e-12)
                ),
                "n_classes": int(len(per_class_df)),
            }
        else:
            summary = {
                "weight_mean": 0.0,
                "weight_median": 0.0,
                "weight_p5": 0.0,
                "weight_p95": 0.0,
                "weight_max_min_ratio": 0.0,
                "n_classes": int(len(per_class_df)),
            }
        return weights, {
            "enabled": True,
            "options": opts,
            "per_class_df": per_class_df,
            "summary": summary,
        }

    def log_dataset_artifacts(self) -> None:
        """Base runner has nowhere to log; subclasses override."""

    @contextmanager
    def section_profiling(self, name: str):
        with section_profiling(self.profiled_sections, name):
            yield

    @staticmethod
    def current_time_str() -> str:
        return datetime.now().strftime("%Y%m%dT%H%M%S")

    @staticmethod
    def format_metric(metric: float) -> float:
        return round(float(metric), 4)


class TrackingTrainingRunner(TrainingRunner):
    """Runner with the full tracking lifecycle + eval-the-exported-artifact
    (reference: MLflowTrainingRunner, runner.py:254-722)."""

    def __init__(
        self,
        *args,
        tracking_options: TrackingOptions | None = None,
        tracker: LocalTracker | None = None,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.tracking_options = tracking_options or TrackingOptions()
        if tracker is None:
            from mermaid_classifier_tpu.tracking.local_tracker import (
                get_default_tracker,
            )

            tracker = get_default_tracker()
        self.tracker = tracker
        self._run: Run | None = None

    # -- naming ---------------------------------------------------------------

    def _get_model_name(self) -> str:
        """Configured name, or an auto name from the run parameters,
        truncated to 50 chars (reference: runner.py:477-515)."""
        if self.tracking_options.model_name:
            return self.tracking_options.model_name[:50]
        parts = ["mermaid-mlp"]
        if self.dataset_options.coralnet_manifest_uri:
            parts.append("cn")
        if self.dataset_options.include_mermaid:
            parts.append("mermaid")
        if self.dataset_options.subsample is not None:
            parts.append(self.dataset_options.subsample.strategy)
        if self.dataset_options.weighting is not None and (
            self.dataset_options.weighting.enabled
        ):
            parts.append("weighted")
        parts.append(f"ep{self.training_options.epochs}")
        return "-".join(parts)[:50]

    # -- run ---------------------------------------------------------------------

    def run(self, run_name: str | None = None) -> tuple[typing.Any, Path | None]:
        model_name = self._get_model_name()
        if run_name is None:
            run_name = f"{model_name}-{self.current_time_str()}"
        experiment = (
            self.tracking_options.experiment_name
            or settings.default_experiment_name
            or "mermaid-classifier"
        )
        logger.info("Experiment: %s", experiment)

        return_msg = None
        registered_version: Path | None = None

        with self.tracker.start_run(experiment, run_name) as run:
            self._run = run
            run.log_params(
                {
                    "epochs": self.training_options.epochs,
                    "early_stopping_patience": (
                        self.training_options.early_stopping_patience
                        if self.training_options.early_stopping_patience is not None
                        else ""
                    ),
                    "include_mermaid": self.dataset_options.include_mermaid,
                    "coralnet_manifest_uri": self.dataset_options.coralnet_manifest_uri
                    or "",
                    "drop_growthforms": self.dataset_options.drop_growthforms,
                    "label_rollup_spec_csv": os.path.basename(
                        self.dataset_options.label_rollup_spec_csv or ""
                    ),
                    "included_labels_csv": os.path.basename(
                        self.dataset_options.included_labels_csv or ""
                    ),
                    "excluded_labels_csv": os.path.basename(
                        self.dataset_options.excluded_labels_csv or ""
                    ),
                    "ref_val_ratios": str(self.dataset_options.ref_val_ratios),
                }
            )
            if self.dataset_options.subsample is not None:
                run.log_params(self.dataset_options.subsample.to_log_dict())
            else:
                run.log_params({"subsample/enabled": False})
            if self.dataset_options.weighting is not None:
                run.log_params(self.dataset_options.weighting.to_log_dict())
            else:
                run.log_params({"weighting/enabled": False})
            self._log_system_specs(run)

            with SystemMetricsSampler(run, interval=10.0):
                try:
                    return_msg, clf_calibrated, val_results = super().run(
                        run_name=run_name, cleanup_dataset=False
                    )
                    assert self.dataset is not None

                    self._log_weighting_artifacts(run)
                    self._log_subsample_audit(run)
                    self._log_early_stop_info(run)
                    self._log_resident_timings(run)
                    run.log_dict(val_results.to_dict(), "valresult.json")
                    self._log_extra_annotations(run)

                    # Eval-the-artifact: metrics run against the SHIPPED
                    # predictor, never the in-memory model
                    # (reference: runner.py:360-400).
                    ref_batch = next(
                        iter(
                            self.dataset.labels.val.load_data_in_batches(
                                batch_size=5000
                            )
                        ),
                        None,
                    )
                    if ref_batch is None:
                        raise RuntimeError(
                            "Val split yielded no feature batch; refusing to"
                            " export an unverified artifact."
                        )
                    ref_features, _ = ref_batch

                    with tempfile.TemporaryDirectory() as artifact_dir:
                        artifact_path = Path(artifact_dir)
                        with self.section_profiling("Export and parity gate"):
                            model_npz, manifest, max_diff = export_artifact(
                                clf_calibrated,
                                artifact_path,
                                reference_features=ref_features,
                                config={"patch_size": 224},
                            )
                        run.log_metric("export_parity_max_abs_diff", max_diff)
                        model_json = artifact_path / "model.json"
                        predictor = load_predictor(model_npz, model_json)

                        ctx = MetricsContext(
                            val_results=val_results,
                            ba_library=get_benthic_attribute_library(),
                            gf_library=get_growth_form_library(),
                            format_func=self.format_metric,
                            dataset=self.dataset,
                            clf=predictor,
                        )
                        # Eval-the-artifact fast path: the val span already
                        # sits in the resident buffer, and the loaded
                        # predictor exposes its gate-validated params — one
                        # on-device gather + the artifact's own head_apply
                        # replaces re-reading ~GBs of val features from
                        # disk and re-uploading them (the coordinator's
                        # disk-streaming precompute remains the fallback
                        # and the non-resident path).
                        trainer_ref = getattr(self, "_trainer", None)
                        head = getattr(predictor, "head_params", None)
                        if trainer_ref is not None and head is not None:
                            try:
                                with self.section_profiling(
                                    "Artifact val proba (resident)"
                                ):
                                    res = trainer_ref.resident_artifact_val_proba(
                                        clf_calibrated.estimator,
                                        self.dataset.labels.val,
                                        head.as_pytree(),
                                    )
                                if res is not None:
                                    ctx.val_proba, ctx.val_gt_labels = res
                                    # The measurement definition is part
                                    # of the record: reduced-precision
                                    # buffers feed the artifact eval the
                                    # STORAGE-ROUNDED rows (the same rows
                                    # every in-run eval used), not the
                                    # f32 disk features production
                                    # serving sees — say so explicitly
                                    # instead of leaving it implicit in
                                    # the code path (quality band pinned
                                    # by the int8/bf16 cosine tests).
                                    rdtype = getattr(
                                        trainer_ref, "resident_dtype",
                                        "float32",
                                    )
                                    run.log_param(
                                        "artifact_eval_inputs",
                                        f"resident({rdtype})",
                                    )
                                    logger.info(
                                        "val probabilities via resident"
                                        " gather + shipped head params"
                                        " (%d rows, %s storage)",
                                        len(ctx.val_gt_labels), rdtype,
                                    )
                            except Exception:
                                logger.warning(
                                    "resident artifact-eval fast path"
                                    " failed; falling back to disk"
                                    " streaming", exc_info=True,
                                )
                                ctx.val_proba = ctx.val_gt_labels = None
                        with self.section_profiling("Metrics vs shipped artifact"):
                            MetricsCoordinator(ctx, run).compute_and_log_all()

                        run.log_metric(
                            "accuracy", self.format_metric(return_msg.acc)
                        )
                        run.log_dict(
                            {
                                str(epoch): self.format_metric(acc)
                                for epoch, acc in enumerate(return_msg.ref_accs, 1)
                            },
                            "epoch_ref_accuracies.yaml",
                        )

                        run.log_artifact(model_npz, "model/model.npz")
                        run.log_artifact(model_json, "model/model.json")
                        registered_version = self.tracker.register_model(
                            model_name, [model_npz, model_json], run=run
                        )
                finally:
                    # Logged LAST (so the export-gate / artifact-eval /
                    # metrics sections are included) and in the finally
                    # (so a FAILED run still shows where its time went —
                    # the profiling contract, utils/profiling.py). Never
                    # mask the original exception.
                    try:
                        run.log_dataframe(
                            pd.DataFrame(self.profiled_sections),
                            "profiled_sections.csv",
                        )
                    except Exception:
                        logger.warning(
                            "failed to log profiled_sections.csv",
                            exc_info=True,
                        )
                    if getattr(self, "dataset", None) is not None:
                        self.dataset.cleanup()

        logger.info("Registered model at: %s", registered_version)

        # Remote tracking: mirror the finished run (and the registry entry)
        # into the object store when a sync bucket is configured — the
        # tracking-server analog, with the store as the shared plane
        # (tracking/store_sync.py). Never fatal: the local run is complete
        # either way.
        if settings.tracking_sync_bucket:
            try:
                from mermaid_classifier_tpu.data.store import get_default_store
                from mermaid_classifier_tpu.tracking.store_sync import (
                    sync_registry_to_store,
                    sync_run_to_store,
                )

                store = get_default_store()
                # Just this run + the registry: a whole-tracker sync would
                # re-probe every historical object on every run.
                sync_run_to_store(run, store, settings.tracking_sync_bucket)
                sync_registry_to_store(
                    self.tracker, store, settings.tracking_sync_bucket
                )
            except Exception:  # noqa: BLE001 - sync is best-effort
                logger.warning(
                    "tracking sync to bucket %r failed",
                    settings.tracking_sync_bucket,
                    exc_info=True,
                )
        return return_msg, registered_version

    def _on_epoch_end(self, metrics: dict) -> None:
        """Per-epoch step metrics (live training charts) + one-shot
        early-stop summary scalars on the final epoch
        (reference: runner.py:429-475)."""
        run = self._run
        if run is None:
            return
        step = int(metrics["epoch"])
        run.log_metric("epoch/ref_accuracy", float(metrics["ref_accuracy"]), step=step)
        if metrics.get("val_accuracy") is not None:
            run.log_metric(
                "epoch/val_accuracy", float(metrics["val_accuracy"]), step=step
            )
        if metrics.get("val_loss") is not None:
            run.log_metric("epoch/val_loss", float(metrics["val_loss"]), step=step)
        if metrics.get("training_loss") is not None:
            run.log_metric(
                "epoch/training_loss", float(metrics["training_loss"]), step=step
            )
        run.log_metric(
            "epoch/cumulative_seconds", float(metrics["cumulative_seconds"]), step=step
        )
        if metrics.get("final_epoch") is not None:
            run.log_metric("early_stop/final_epoch", float(metrics["final_epoch"]), step=0)
            run.log_metric(
                "early_stop/triggered", float(bool(metrics.get("early_stopped"))), step=0
            )
            if metrics.get("best_val_epoch") is not None:
                run.log_metric(
                    "early_stop/best_val_epoch", float(metrics["best_val_epoch"]), step=0
                )
            if metrics.get("best_val_loss") is not None:
                run.log_metric(
                    "early_stop/best_val_loss", float(metrics["best_val_loss"]), step=0
                )

    # -- logging helpers -------------------------------------------------------

    def _log_system_specs(self, run: Run) -> None:
        import platform

        import psutil

        run.log_params(
            {
                "system/platform": platform.platform(),
                "system/python": platform.python_version(),
                "system/cpus": psutil.cpu_count(),
                "system/memory_gb": round(psutil.virtual_memory().total / 1e9, 1),
            }
        )
        try:
            import jax

            run.log_params(
                {
                    "system/jax": jax.__version__,
                    "system/jax_backend": jax.default_backend(),
                    "system/jax_devices": str(jax.devices()),
                }
            )
        except Exception:  # noqa: BLE001
            pass

    def _log_weighting_artifacts(self, run: Run) -> None:
        log = self._weighting_log
        if not log.get("enabled"):
            return
        run.log_dataframe(log["per_class_df"], "weighting/per_class_weights.csv")
        for key, value in log["summary"].items():
            run.log_metric(f"weighting/{key}", float(value))

    def _log_subsample_audit(self, run: Run) -> None:
        assert self.dataset is not None
        audit = self.dataset._subsample_audit_df
        if audit is None:
            return
        run.log_dataframe(audit, "subsample/per_class_audit.csv")
        if self.dataset._subsample_realized_total is not None:
            run.log_metric(
                "subsample/realized_total",
                float(self.dataset._subsample_realized_total),
            )

    def _log_early_stop_info(self, run: Run) -> None:
        info = getattr(self, "_early_stop_info", None)
        if info:
            run.log_dict(info, "early_stop_info.json")

    def _log_resident_timings(self, run: Run) -> None:
        """resident/* metrics: the stage budget of the device-resident
        upload path (disk load, upload, AOT program warm), so a full-scale
        drive's wall-clock decomposes inside the tracked run itself."""
        timings = getattr(self, "_resident_timings", None)
        if timings:
            for key, value in timings.items():
                run.log_metric(f"resident/{key}", float(value))

    def _log_extra_annotations(self, run: Run) -> None:
        assert self.dataset is not None
        run.log_dataframe(
            self.dataset.get_annotations("all").query("training_set == 'val'"),
            "annotations_val.csv",
        )
        spec = self.tracking_options.extra_annotations_to_log
        if spec:
            run.log_dataframe(
                self.dataset.get_annotations(spec), f"annotations_{spec}.csv"
            )

    def log_dataset_artifacts(self) -> None:
        assert self.dataset is not None and self._run is not None
        run = self._run
        artifacts = self.dataset.artifacts
        run.log_dataframe(artifacts.ba_counts, "dataset/ba_counts.csv")
        run.log_dataframe(artifacts.bagf_counts, "dataset/bagf_counts.csv")
        if not artifacts.coralnet_project_stats.empty:
            run.log_dataframe(
                artifacts.coralnet_project_stats, "dataset/coralnet_project_stats.csv"
            )
        if not artifacts.mermaid_project_stats.empty:
            run.log_dataframe(
                artifacts.mermaid_project_stats, "dataset/mermaid_project_stats.csv"
            )
        if hasattr(artifacts, "coralnet_label_mapping"):
            run.log_dataframe(
                artifacts.coralnet_label_mapping, "dataset/coralnet_label_mapping.csv"
            )
        if hasattr(artifacts, "unmapped_labels") and len(artifacts.unmapped_labels):
            run.log_dataframe(
                artifacts.unmapped_labels, "dataset/unmapped_labels.csv"
            )
        run.log_dict(
            artifacts.train_summary_stats, "dataset/train_summary_stats.yaml"
        )
