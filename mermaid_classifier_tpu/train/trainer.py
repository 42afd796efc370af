"""MermaidTrainer: the epoch loop with streaming evaluation, early stopping,
batched Platt calibration, and per-epoch callbacks.

Semantics mirror the reference trainer
(reference: mermaid_classifier/pyspacer/trainer.py:43-403):

- fixed production architecture (500, 300, 100) @ lr 1e-4, random_state=0;
- per epoch: stream train batches from disk into ``partial_fit`` (epoch index
  as the shuffle seed), then streamed ref accuracy and val accuracy+log-loss;
- early stopping on val_loss with a deepcopy best snapshot that is restored
  even when the full epoch budget runs out;
- calibration streams ref data, accumulating only (N, K) scores — never
  (N, 4096) features;
- per-epoch callback dict with one-shot final-epoch summary fields.

Train/ref/val data are never simultaneously in memory (reference:
trainer.py:43-53): each evaluation pass re-streams from disk after the
training batches go out of scope.
"""

from __future__ import annotations

import copy
import time
from collections.abc import Callable
from contextlib import contextmanager
from logging import getLogger
from typing import Any

import numpy as np

from mermaid_classifier_tpu.data.labels import (
    ImageLabels,
    TrainingTaskLabels,
    evaluate_classifier,
)
from mermaid_classifier_tpu.data.results import TrainClassifierReturnMsg, ValResults
from mermaid_classifier_tpu.train.calibration import (
    CalibratedClassifier,
    TemperatureCalibratedClassifier,
)
from mermaid_classifier_tpu.train.mlp_classifier import MLPClassifier

logger = getLogger(__name__)


# sklearn.metrics (and the scipy.stats tree it drags in) costs ~2 s of
# import warm and minutes cold under host-memory weather; this module
# only needs two small metric functions, at call time — import lazily so
# every CLI's startup (the drive's unprofiled train-stage seconds) stays
# lean.


def accuracy_score(*args, **kwargs):
    from sklearn.metrics import accuracy_score as _accuracy_score

    return _accuracy_score(*args, **kwargs)


def sklearn_log_loss(*args, **kwargs):
    from sklearn.metrics import log_loss as _log_loss

    return _log_loss(*args, **kwargs)


class CheckpointMismatchError(RuntimeError):
    """A checkpoint_dir holds state from an incompatible run configuration."""


# Production MLP architecture from the reference's hidden-layer experiments
# (reference: trainer.py:114-123, docs/research/hidden-layer-experiments.md).
PRODUCTION_HIDDEN_LAYERS = (500, 300, 100)
PRODUCTION_LEARNING_RATE = 1e-4
PRODUCTION_RANDOM_STATE = 0


class _FilledPrefix:
    """Thread-safe watermark over a buffer being filled in disjoint row
    spans: ``add(start, end)`` publishes a completed span, ``wait(n)``
    blocks until rows [0, n) are ALL complete. The fill completes spans
    nearly in order (sorted image keys across a bounded worker pool), so
    the contiguous-prefix watermark advances smoothly — this is what lets
    the device upload stream slabs behind the disk fill instead of
    serializing after it. ``fail(exc)`` aborts every waiter (a fill error
    must kill the uploader, never hang it)."""

    def __init__(self, total: int):
        import threading

        self._cv = threading.Condition()
        self._total = int(total)
        self._watermark = 0
        self._pending: list[tuple[int, int]] = []  # heap of (start, end)
        self._exc: BaseException | None = None

    def add(self, start: int, n: int) -> None:
        import heapq

        with self._cv:
            heapq.heappush(self._pending, (start, start + n))
            while self._pending and self._pending[0][0] <= self._watermark:
                _, end = heapq.heappop(self._pending)
                if end > self._watermark:
                    self._watermark = end
            self._cv.notify_all()

    def fail(self, exc: BaseException) -> None:
        with self._cv:
            self._exc = exc
            self._cv.notify_all()

    def wait(self, n: int) -> None:
        with self._cv:
            while self._watermark < min(n, self._total):
                if self._exc is not None:
                    raise RuntimeError(
                        "resident fill failed while the upload was waiting"
                        f" for {n} rows"
                    ) from self._exc
                self._cv.wait(timeout=1.0)


@contextmanager
def _log_entry_and_exit(name: str):
    """DEBUG-level enter/exit timing around a pipeline phase
    (reference: trainer.py:30-40)."""
    start_time = time.time()
    logger.debug("Entering: %s", name)
    try:
        yield
    finally:
        logger.debug("Exiting: %s after %f seconds.", name, time.time() - start_time)


class MermaidTrainer:
    """Epoch-loop trainer producing a calibrated classifier + val results."""

    def __init__(
        self,
        batch_size: int,
        on_epoch_end: Callable[[dict[str, Any]], None] | None = None,
        class_weight: dict[str, float] | None = None,
        early_stopping_patience: int | None = None,
        packed_cache_dir: str | None = None,
        checkpoint_dir: str | None = None,
        mesh=None,
        device_resident: bool = False,
        resident_dtype: str = "float32",
        calibration_backend: str = "scipy",
        calibration_method: str = "sigmoid",
        resident_load_workers: int = 8,
    ):
        if early_stopping_patience is not None and early_stopping_patience < 1:
            raise ValueError(
                f"early_stopping_patience must be >= 1 or None, got"
                f" {early_stopping_patience!r}"
            )
        self.batch_size = batch_size
        self.on_epoch_end = on_epoch_end
        self.class_weight = class_weight
        self.early_stopping_patience = early_stopping_patience
        # When set, train/ref/val features are packed ONCE into flat caches
        # under this dir and every epoch's batch streaming becomes native
        # row gathers (native/fastbatch) instead of per-image npz reads.
        self.packed_cache_dir = packed_cache_dir
        # When set, full trainer state (classifier, optimizer, early-stopping
        # bookkeeping, best snapshot) is checkpointed after every epoch and
        # training RESUMES from the last checkpoint — a capability the
        # reference lacks (a spot interruption restarts from epoch zero;
        # reference: docs/training_at_scale.md:314-316, SURVEY.md §5.3/5.4).
        # Epoch shuffle order is seeded by the epoch index, so a resumed run
        # is bit-identical to an uninterrupted one (pinned by test).
        self.checkpoint_dir = checkpoint_dir
        # Optional device mesh: the classifier trains data-parallel over it
        # (identical numerics; see MLPClassifier.mesh).
        self.mesh = mesh
        # Device-resident epochs: the train features are pinned on device
        # ONCE and every epoch gathers rows by index on device — per-epoch
        # host->device traffic drops from O(rows x 4096) floats to O(rows)
        # int32s, bit-identical to the streamed path (differential-tested).
        # The TPU-first answer to the reference's per-epoch disk re-read
        # (reference: trainer.py:138-145). Composes with a mesh: the buffer
        # row-shards across every chip (capacity beyond one HBM) and the
        # gathered mini-batches train data-parallel.
        self.device_resident = bool(device_resident)
        # Storage precision for the resident buffer: "bfloat16" halves the
        # upload bytes and HBM footprint (doubling per-chip resident
        # capacity); compute stays f32 — rows are upcast after the
        # on-device gather (MLPClassifier.RESIDENT_DTYPES).
        self.resident_dtype = resident_dtype
        # Thread-pool width for reading the per-image feature files into
        # the resident buffer (ImageLabels.load_into) — same default as the
        # extraction pipeline's decode-ahead pool.
        self.resident_load_workers = resident_load_workers
        # Platt-fit backend (CalibratedClassifier.BACKENDS): "scipy" is the
        # sklearn-parity per-class L-BFGS; "device" batches all K fits into
        # one jitted Newton solve (<=6e-5 relative agreement measured at
        # 359k x 80). Device wins only with a warm compile cache — the
        # remote compile service charges minutes for the first solve, so
        # scipy stays the default for one-shot drives.
        self.calibration_backend = calibration_backend
        # Calibration family: "sigmoid" is the reference-parity prefit-Platt
        # recipe; "temperature" is the beyond-parity single-scalar NLL fit
        # (TemperatureCalibratedClassifier) that preserves the uncalibrated
        # argmax and strictly improves ref-split NLL over no calibration —
        # the sigmoid recipe RAISED log_loss at C2 scale for both stacks
        # on the same corpus (docs/runs/sklearn_same_corpus_baseline_*).
        if calibration_method not in ("sigmoid", "temperature"):
            raise ValueError(
                f"calibration_method must be 'sigmoid' or 'temperature',"
                f" got {calibration_method!r}"
            )
        self.calibration_method = calibration_method
        # Populated by __call__; readable by the runner for tracking
        # (reference: trainer.py:79-81).
        self._early_stop_info: dict[str, Any] | None = None
        # Stage budget of the resident upload path (load/upload/warm
        # seconds), populated per resident __call__; runner logs as
        # resident/* metrics.
        self.resident_timings: dict[str, float] | None = None

    # -- checkpoint / resume -------------------------------------------------

    _CHECKPOINT_NAME = "trainer_checkpoint.pkl"

    def _checkpoint_path(self) -> str | None:
        if self.checkpoint_dir is None:
            return None
        import os

        return os.path.join(self.checkpoint_dir, self._CHECKPOINT_NAME)

    def _save_checkpoint(self, state: dict[str, Any]) -> None:
        """Atomic (tmp + rename) per-epoch checkpoint. Training-lane only —
        the SHIPPED artifact stays pickle-free (inference/export.py); this
        file is internal resume state, like the reference classifier's own
        state_dict pickling (reference: torch_classifier.py:410-444)."""
        import os
        import pickle
        import tempfile

        path = self._checkpoint_path()
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.checkpoint_dir, suffix=".part")
        try:
            with os.fdopen(fd, "wb") as f:
                pickle.dump(state, f)
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def _load_checkpoint(
        self, expected_fingerprint: dict[str, Any]
    ) -> dict[str, Any] | None:
        import os
        import pickle

        path = self._checkpoint_path()
        if path is None or not os.path.isfile(path):
            return None
        with open(path, "rb") as f:
            state = pickle.load(f)
        found = state.get("fingerprint")
        if found != expected_fingerprint:
            # A checkpoint_dir reused across runs with a different dataset,
            # architecture, or batch size would silently resume from stale
            # weights — a wrong model masquerading as a bit-identical resume.
            # Refuse instead; the operator must clear the dir deliberately.
            raise CheckpointMismatchError(
                f"checkpoint at {path} was written by a different run"
                f" configuration and cannot be resumed here.\n"
                f"  checkpoint fingerprint: {found}\n"
                f"  this run's fingerprint: {expected_fingerprint}\n"
                f"Delete {path} (or point checkpoint_dir elsewhere) to start"
                f" fresh."
            )
        logger.info(
            "Resuming from checkpoint %s (next epoch %d).",
            path,
            state["next_epoch"],
        )
        return state

    def _clear_checkpoint(self) -> None:
        import os

        path = self._checkpoint_path()
        if path is not None and os.path.isfile(path):
            os.unlink(path)

    @staticmethod
    def _clf_to_state(clf: MLPClassifier | None) -> dict | None:
        return None if clf is None else clf.__getstate__()

    @staticmethod
    def _clf_from_state(state: dict | None) -> MLPClassifier | None:
        if state is None:
            return None
        clf = MLPClassifier.__new__(MLPClassifier)
        clf.__setstate__(dict(state))
        return clf

    def _run_fingerprint(
        self,
        clf: MLPClassifier,
        labels: TrainingTaskLabels,
        classes_list: list[Any],
        nbr_epochs: int,
    ) -> dict[str, Any]:
        """Identity of this run for checkpoint compatibility: classes,
        architecture, batch size, class weights, split sizes, epoch budget.
        A resumed checkpoint must match on every field or resumption would
        continue a DIFFERENT run's training."""
        return {
            "classes": [str(c) for c in classes_list],
            "hidden_layer_sizes": list(
                getattr(clf, "hidden_layer_sizes", ()) or ()
            ),
            "learning_rate_init": getattr(clf, "learning_rate_init", None),
            "random_state": getattr(clf, "random_state", None),
            "batch_size": int(self.batch_size),
            "class_weight": (
                sorted((str(k), float(v)) for k, v in self.class_weight.items())
                if self.class_weight
                else None
            ),
            "early_stopping_patience": self.early_stopping_patience,
            "nbr_epochs": int(nbr_epochs),
            "label_counts": {
                "train": int(labels.train.label_count),
                "ref": int(labels.ref.label_count),
                "val": int(labels.val.label_count),
            },
        }

    def _make_classifier(self, class_weight: dict[str, float] | None) -> MLPClassifier:
        """Hook for tests to swap the classifier architecture."""
        return MLPClassifier(
            hidden_layer_sizes=PRODUCTION_HIDDEN_LAYERS,
            learning_rate_init=PRODUCTION_LEARNING_RATE,
            class_weight=class_weight,
            random_state=PRODUCTION_RANDOM_STATE,
            mesh=self.mesh,
        )

    def __call__(
        self,
        labels: TrainingTaskLabels,
        nbr_epochs: int,
        pc_models: list[Any],
        **_kwargs: Any,
    ) -> tuple[CalibratedClassifier, ValResults, TrainClassifierReturnMsg]:
        logger.debug(
            "Unique classes: Train + Ref = %d, Val = %d",
            len(labels.ref.classes_set),
            len(labels.val.classes_set),
        )
        logger.debug(
            "Label count: Train = %d, Ref = %d, Val = %d, Total = %d",
            labels.train.label_count,
            labels.ref.label_count,
            labels.val.label_count,
            labels.label_count,
        )
        logger.debug("Batch size: %d labels", self.batch_size)

        if self.packed_cache_dir is not None:
            with _log_entry_and_exit("packing feature caches"):
                import os

                for split_name in ("train", "ref", "val"):
                    split = getattr(labels, split_name)
                    if len(split):
                        split.build_packed_cache(
                            os.path.join(self.packed_cache_dir, split_name)
                        )

        classes_list = sorted(labels.ref.classes_set)

        with _log_entry_and_exit("training MLP"):
            clf = self._make_classifier(self.class_weight)

            ref_accs: list[float] = []
            t0 = time.time()

            best_val_loss: float = float("inf")
            best_clf_snapshot = None
            best_epoch_idx: int | None = None
            epochs_since_best: int = 0
            stop_reason: str = "budget_exhausted"
            epoch: int = 0
            start_epoch: int = 0

            fingerprint = self._run_fingerprint(
                clf, labels, classes_list, nbr_epochs
            )
            checkpoint = self._load_checkpoint(fingerprint)
            if checkpoint is not None:
                clf = self._clf_from_state(checkpoint["clf"])
                # Checkpoints serialize mesh-less; re-attach this trainer's.
                clf.mesh = self.mesh
                best_clf_snapshot = self._clf_from_state(
                    checkpoint["best_clf"]
                )
                ref_accs = list(checkpoint["ref_accs"])
                best_val_loss = checkpoint["best_val_loss"]
                best_epoch_idx = checkpoint["best_epoch_idx"]
                epochs_since_best = checkpoint["epochs_since_best"]
                start_epoch = int(checkpoint["next_epoch"])
                # If the budget is already exhausted the loop body never
                # runs; keep `epoch` pointing at the last completed epoch.
                epoch = max(start_epoch - 1, 0)

            # Per-call reset: stale offsets/buffers from a previous __call__
            # must never leak into this one (e.g. a resumed run whose budget
            # is already exhausted skips the upload below and then streams
            # its evals from disk — correct, just not resident).
            self._resident_split_offsets = None
            self._resident_buffer = None
            self._resident_buffer_scale = None
            self._resident_buffer_dtype = "float32"
            self._resident_buffer_n_rows = None
            self.resident_timings = None
            if self.device_resident and nbr_epochs > start_epoch:
                # ONE combined upload for the whole run: [train | ref | val]
                # rows in canonical layout — training gathers from the train
                # span and the per-epoch evals + calibration gather from the
                # ref/val spans (a resumed run re-uploads here too: the
                # checkpoint stores model state only, never the data buffer).
                #
                # Offsets hold a STRONG reference to each split object and
                # match by identity, so a recycled id() can never alias a
                # stale entry onto a new split.
                self._resident_split_offsets = {}
                split_plan: list[tuple[Any, int]] = []
                pos = 0
                for split_name in ("train", "ref", "val"):
                    split = getattr(labels, split_name)
                    self._resident_split_offsets[split_name] = (split, pos)
                    if len(split):
                        split_plan.append((split, pos))
                        pos += split.label_count

                # AOT-compile the epoch/eval programs in the background
                # while the buffer loads from disk and uploads — through
                # the remote-compile tunnel the first epoch-scan compile
                # costs minutes that otherwise serialize after the
                # minutes-long upload (compilation needs shapes only).
                warm_thread = None
                warm_stats: dict[str, Any] = {}
                dim = self._probe_feature_dim(split_plan[0][0]) if split_plan else 0
                if getattr(clf, "mesh", None) is None and split_plan:
                    # Union over EVERY epoch's shuffle seed: per-epoch
                    # reshuffles regroup images, so a corpus with
                    # heterogeneous points-per-image can realize batch
                    # geometries in later epochs that epoch 0 never saw —
                    # each miss would pay a minutes-long remote epoch-scan
                    # compile mid-training. iter_index_batches is pure
                    # index arithmetic, so the sweep costs milliseconds
                    # per epoch.
                    train_counts = {
                        len(y)
                        for epoch_seed in range(start_epoch, nbr_epochs)
                        for _, y in labels.train.iter_index_batches(
                            batch_size=self.batch_size,
                            random_seed=epoch_seed,
                        )
                    }
                    ref_counts = {
                        len(y)
                        for _, y in labels.ref.iter_index_batches(
                            batch_size=self.batch_size
                        )
                    }
                    eval_counts = ref_counts | {
                        len(y)
                        for _, y in labels.val.iter_index_batches(
                            batch_size=self.batch_size
                        )
                    }
                    # The eval-the-artifact fast path gathers the WHOLE val
                    # span in one dispatch (resident_artifact_val_proba);
                    # warm its head program too so the drive-end artifact
                    # eval never pays a serialized remote compile.
                    head_counts = (
                        {labels.val.label_count} if len(labels.val) else set()
                    )
                    def _warm() -> None:
                        try:
                            warm_stats.update(clf.warm_resident_programs(
                                n_rows=pos,
                                dim=dim,
                                n_classes=len(classes_list),
                                train_batch_row_counts=train_counts,
                                eval_batch_row_counts=eval_counts,
                                # Per-epoch ref AND val evals dispatch the
                                # fused counts program (two-scalar
                                # readback) — warm it for both geometries.
                                eval_pair_row_counts=eval_counts,
                                head_row_counts=head_counts,
                                dtype=self.resident_dtype,
                                head_calibration=self.calibration_method,
                            ))
                        except Exception as exc:  # fall back to jit-on-call
                            warm_stats["error"] = repr(exc)

                    import threading

                    warm_thread = threading.Thread(
                        target=_warm, name="resident-warm", daemon=True
                    )
                    warm_thread.start()

                # One preallocated buffer spanning all three splits, filled
                # by parallel per-image reads (no per-split list + vstack
                # copy: peak host memory is the buffer alone). The buffer
                # is pre-touched in full BEFORE the reads: interleaving
                # first-touch faults with the per-image read allocations
                # measured up to ~100x slower on a memory-weather-bound
                # host (146 s vs 0.6+0.9 s for a 655 MB fill in the same
                # window). The pre-touch itself runs as THREADED disjoint
                # row-slabs: first-touch fault latency is wait-bound on
                # the host granting pages, and concurrent faults pipeline
                # when the guest already holds the pages; growth past the
                # guest's high-water mark stays host-rate-limited
                # (docs/perf_roofline.md §4).
                t_load = time.time()
                # The staging buffer is allocated in the STORAGE dtype:
                # bf16 rows cast on assignment, int8 rows quantize inline
                # with the parallel reads (per image, disjoint slices) —
                # so the full-size f32 matrix never exists on the host.
                # At production scale that cuts the first-touch pre-touch
                # (the weather-bound component) and peak host memory 2-4x,
                # and folds the quantize pass into the read overlap.
                # Buffer bits are identical to staging f32 then converting
                # (differential-tested).
                rdtype = self.resident_dtype
                row_transform = None
                scale_vec = None
                if rdtype == "int8":
                    import jax.numpy as _jnp  # noqa: F401  (storage dtypes)

                    stacked = np.empty((pos, dim), dtype=np.int8)
                    scale_vec = np.empty(pos, dtype=np.float32)
                    tiny = np.finfo(np.float32).tiny

                    def row_transform(x, out_rows, buffer_row):
                        # The RESIDENT_DTYPES int8 formula, per image:
                        # scale = absmax/127 (floored at the smallest
                        # normal f32), rows = clip(rint(x * 1/scale)).
                        s = np.maximum(x.max(axis=1), -x.min(axis=1))
                        s /= 127.0
                        s[s < tiny] = 1.0
                        inv = (1.0 / s).astype(np.float32)
                        t = x * inv[:, None]
                        np.rint(t, out=t)
                        np.clip(t, -127.0, 127.0, out=t)
                        out_rows[...] = t
                        scale_vec[buffer_row: buffer_row + len(s)] = s
                elif rdtype == "bfloat16":
                    import jax.numpy as _jnp

                    stacked = np.empty((pos, dim), dtype=_jnp.bfloat16)
                else:
                    stacked = np.empty((pos, dim), dtype=np.float32)
                self._pretouch_parallel(stacked, self.resident_load_workers)
                pretouch_s = time.time() - t_load

                # Pipelined fill -> upload: the disk fill publishes each
                # image's completed rows (on_rows_filled) into a
                # contiguous-prefix watermark, and the uploader thread
                # streams ~256 MB slabs behind it (each slab's wait_rows
                # blocks until its rows are final). The fill writes rows
                # in near-sorted order across the worker pool, so the
                # watermark advances smoothly and the two multi-minute
                # stages overlap instead of serializing — wall-clock is
                # ~max(fill, upload) + the uploader's tail, not their sum.
                # A mesh run degrades gracefully: the sharded put waits
                # for the full matrix (identical to the serial order).
                import threading as _threading

                tracker = _FilledPrefix(pos)
                upload_exc: list[BaseException] = []
                t_up = time.time()

                def _upload() -> None:
                    try:
                        if rdtype == "float32":
                            clf.set_resident_features(
                                stacked, dtype=rdtype,
                                wait_rows=tracker.wait,
                            )
                        else:
                            clf.set_resident_features_storage(
                                stacked, scale_vec, wait_rows=tracker.wait
                            )
                    except BaseException as exc:  # rethrown on join below
                        upload_exc.append(exc)

                def _publish(start: int, n: int) -> None:
                    # Cancellation runs BOTH ways: a dead uploader (device
                    # OOM, wedged transfer) aborts the fill at its next
                    # published span instead of letting a multi-minute
                    # fill run to completion before the error surfaces.
                    if upload_exc:
                        raise RuntimeError(
                            "resident upload failed; aborting the disk fill"
                        ) from upload_exc[0]
                    tracker.add(start, n)

                upload_thread = _threading.Thread(
                    target=_upload, name="resident-upload", daemon=True
                )
                upload_thread.start()
                try:
                    for split, offset in split_plan:
                        split.load_into(
                            stacked, offset,
                            max_workers=self.resident_load_workers,
                            row_transform=row_transform,
                            on_rows_filled=_publish,
                        )
                except BaseException as exc:
                    tracker.fail(exc)  # abort the uploader, never hang it
                    upload_thread.join()
                    # The fill died BECAUSE the uploader died: surface the
                    # uploader's root cause, not the abort wrapper.
                    if upload_exc and exc.__cause__ is upload_exc[0]:
                        raise upload_exc[0]
                    raise
                load_s = time.time() - t_load
                logger.info(
                    "resident feature buffer loaded from disk in %.1fs"
                    " (%d rows x %d, %.2f GB %s storage, %d read workers;"
                    " upload streaming concurrently)",
                    load_s, stacked.shape[0], dim,
                    stacked.nbytes / 1e9, rdtype,
                    self.resident_load_workers,
                )
                t_join = time.time()
                upload_thread.join()
                if upload_exc:
                    raise upload_exc[0]
                upload_s = time.time() - t_up
                upload_extra_s = time.time() - t_join
                logger.info(
                    "resident buffer staged: upload thread ran %.1fs,"
                    " +%.1fs beyond the disk fill (transfer may complete"
                    " asynchronously under the first training step)",
                    upload_s, upload_extra_s,
                )
                warm_wait_s = 0.0
                if warm_thread is not None:
                    t_join = time.time()
                    warm_thread.join()
                    warm_wait_s = time.time() - t_join
                    logger.info(
                        "program warm: %s (+%.1fs beyond the upload)",
                        warm_stats or "no stats", warm_wait_s,
                    )
                # Machine-readable stage budget — the runner logs these as
                # resident/* metrics so a full-scale drive's wall-clock is
                # self-explaining in the tracked run, not just in logs.
                self.resident_timings = {
                    "load_seconds": round(load_s, 1),
                    # Host-side quantization/cast inside the upload stage
                    # (int8 only; 0.0 otherwise) — CPU work a real VM pays
                    # too, so the VM projection adds it back.
                    "quantize_seconds": round(float(
                        getattr(clf, "_resident_upload_timings", {}).get(
                            "quantize_seconds", 0.0
                        )
                    ), 1),
                    # Inside load_seconds: the sequential page pre-touch of
                    # the buffer — the component that tracks host memory
                    # weather, not disk or code.
                    "pretouch_seconds": round(pretouch_s, 1),
                    # Upload-thread lifetime — it STARTS with the fill
                    # (pipelined), so most of it overlaps load_seconds.
                    "upload_stage_seconds": round(upload_s, 1),
                    # The upload's serialized contribution to wall-clock:
                    # how long it kept running AFTER the fill finished.
                    # This — not upload_stage_seconds — is what a faster
                    # link would recover (the VM projection uses it).
                    "upload_extra_wait_seconds": round(upload_extra_s, 1),
                    "warm_seconds": float(warm_stats.get("seconds", 0.0)),
                    "warm_extra_wait_seconds": round(warm_wait_s, 1),
                    "warm_epoch_programs": float(
                        warm_stats.get("epoch_programs", 0)
                    ),
                    "warm_forward_programs": float(
                        warm_stats.get("forward_programs", 0)
                    ),
                    "warm_head_programs": float(
                        warm_stats.get("head_programs", 0)
                    ),
                    "warm_pred_programs": float(
                        warm_stats.get("pred_programs", 0)
                    ),
                    "warm_eval_programs": float(
                        warm_stats.get("eval_programs", 0)
                    ),
                    "rows": float(pos),
                    "gigabytes_f32": round(stacked.nbytes / 1e9, 2),
                }
                # Kept so a best-snapshot restored from a CHECKPOINT (which
                # never carries the data buffer) can be re-attached before
                # the resident calibration/eval passes below. The scale
                # vector travels WITH the buffer: an int8 buffer without
                # its per-row scales is unreadable.
                self._resident_buffer = clf._resident_X
                self._resident_buffer_scale = getattr(
                    clf, "_resident_scale", None
                )
                self._resident_buffer_dtype = clf._resident_dtype
                self._resident_buffer_n_rows = clf._resident_n_rows
                del stacked

            t_epochs = time.time()
            # Per-split (index, true-class-index) arrays for the fused
            # on-device eval — built once on first use (classes_ exists
            # after the first partial_fit), reused every epoch.
            eval_cache: dict[int, list] = {}
            for epoch in range(start_epoch, nbr_epochs):
                if self.device_resident:
                    # Same image order, batch boundaries, and row sequence
                    # as the streamed path — only the gather moved on device.
                    for idx, y in labels.train.iter_index_batches(
                        batch_size=self.batch_size,
                        random_seed=epoch,
                    ):
                        clf.partial_fit_resident(idx, y, classes=classes_list)
                else:
                    # Training: stream batches from disk, partial_fit, release.
                    for x, y in labels.train.load_data_in_batches(
                        batch_size=self.batch_size,
                        random_seed=epoch,
                    ):
                        clf.partial_fit(x, y, classes=classes_list)

                ref_eval = self._resident_eval_batched(
                    clf, labels.ref, eval_cache
                )
                ref_accs.append(
                    ref_eval[0]
                    if ref_eval is not None
                    else self._calc_acc_batched(clf, labels.ref)
                )
                logger.debug("Epoch %d, acc: %s", epoch, ref_accs[-1])

                # Per-epoch val accuracy + log_loss streamed the same way;
                # computed on the UNCALIBRATED head — the trend is the
                # overfitting signal, not the absolute value
                # (reference: trainer.py:153-168). Resident splits use the
                # fused device eval (two scalars cross back per epoch, not
                # the (N, K) matrix); non-resident splits stream from disk.
                val_eval = self._resident_eval_batched(
                    clf, labels.val, eval_cache
                )
                if val_eval is not None:
                    val_acc, val_loss = val_eval
                else:
                    val_acc, val_loss = self._calc_acc_and_log_loss_batched(
                        clf, labels.val, classes_list
                    )
                logger.info(
                    "Epoch %d: ref_acc=%.4f val_acc=%.4f val_loss=%.4f"
                    " (%.1fs elapsed)",
                    epoch, ref_accs[-1], val_acc, val_loss, time.time() - t0,
                )

                if self.early_stopping_patience is not None:
                    if val_loss < best_val_loss:
                        best_val_loss = val_loss
                        best_epoch_idx = epoch
                        best_clf_snapshot = copy.deepcopy(clf)
                        epochs_since_best = 0
                    else:
                        epochs_since_best += 1

                will_stop_after_this = epoch == nbr_epochs - 1 or (
                    self.early_stopping_patience is not None
                    and epochs_since_best >= self.early_stopping_patience
                )

                if self.on_epoch_end is not None:
                    loss_curve = getattr(clf, "loss_curve_", [None])
                    cb_metrics: dict[str, Any] = {
                        "epoch": epoch,
                        "ref_accuracy": ref_accs[-1],
                        "val_accuracy": val_acc,
                        "val_loss": val_loss,
                        "training_loss": loss_curve[-1] if loss_curve else None,
                        "cumulative_seconds": time.time() - t0,
                    }
                    if will_stop_after_this:
                        # One-shot summary fields fire only on the final epoch
                        # (reference: trainer.py:201-215).
                        early_stopped = (
                            self.early_stopping_patience is not None
                            and epochs_since_best >= self.early_stopping_patience
                        )
                        cb_metrics["final_epoch"] = epoch + 1
                        cb_metrics["early_stopped"] = early_stopped
                        if best_epoch_idx is not None:
                            cb_metrics["best_val_epoch"] = best_epoch_idx + 1
                            cb_metrics["best_val_loss"] = best_val_loss
                    self.on_epoch_end(cb_metrics)

                if self.checkpoint_dir is not None:
                    self._save_checkpoint(
                        {
                            "fingerprint": fingerprint,
                            "next_epoch": epoch + 1,
                            "clf": self._clf_to_state(clf),
                            "best_clf": self._clf_to_state(best_clf_snapshot),
                            "ref_accs": list(ref_accs),
                            "best_val_loss": best_val_loss,
                            "best_epoch_idx": best_epoch_idx,
                            "epochs_since_best": epochs_since_best,
                        }
                    )

                if (
                    self.early_stopping_patience is not None
                    and epochs_since_best >= self.early_stopping_patience
                ):
                    stop_reason = "early_stopping"
                    logger.info(
                        "Early stopping at epoch %d: val_loss has not improved"
                        " for %d consecutive epochs. Best was epoch %d"
                        " (val_loss=%.4f).",
                        epoch + 1,
                        self.early_stopping_patience,
                        (best_epoch_idx or 0) + 1,
                        best_val_loss,
                    )
                    break

            epochs_s = time.time() - t_epochs

            # Restore the best-val_loss classifier unconditionally when early
            # stopping is active, so a full-budget run still ships the best
            # snapshot (reference: trainer.py:232-249).
            if (
                self.early_stopping_patience is not None
                and best_clf_snapshot is not None
                and best_epoch_idx != epoch
            ):
                logger.info(
                    "Restoring classifier from epoch %d (val_loss=%.4f);"
                    " latest epoch was %d epochs past best.",
                    (best_epoch_idx or 0) + 1,
                    best_val_loss,
                    epochs_since_best,
                )
                clf = best_clf_snapshot
            self._early_stop_info = {
                "enabled": self.early_stopping_patience is not None,
                "patience": self.early_stopping_patience,
                "stop_reason": stop_reason,
                "final_epoch": epoch + 1,
                "best_val_epoch": (
                    best_epoch_idx + 1 if best_epoch_idx is not None else None
                ),
                "best_val_loss": (
                    best_val_loss if best_val_loss != float("inf") else None
                ),
            }
        if (
            self.device_resident
            and getattr(self, "_resident_buffer", None) is not None
            and getattr(clf, "_resident_X", None) is None
        ):
            # Full re-attach: buffer + scale + the metadata the resident
            # paths read (a checkpoint-restored snapshot keeps
            # _resident_dtype through pickling but never the buffers; an
            # int8 buffer re-attached without its scale vector would
            # crash predict_proba_resident).
            clf._resident_X = self._resident_buffer
            clf._resident_scale = getattr(
                self, "_resident_buffer_scale", None
            )
            clf._resident_dtype = getattr(
                self, "_resident_buffer_dtype", "float32"
            )
            clf._resident_n_rows = getattr(
                self, "_resident_buffer_n_rows",
                int(self._resident_buffer.shape[0]),
            )

        # Calibration: stream ref data in batches — O(N*K) accumulation, not
        # O(N*4096) (reference: trainer.py:261-265).
        t_calib = time.time()
        with _log_entry_and_exit("calibration"):
            clf_calibrated = self._calibrate_in_batches(clf, labels.ref)
        calibration_s = time.time() - t_calib

        classes = list(clf_calibrated.classes_)

        # Evaluate the new classifier on the validation set — through the
        # resident gather when val lives on device (the disk-streamed path
        # re-reads and re-uploads the full (N, 4096) f32 matrix, ~50 s of
        # the C2 drive through the tunnel; the gather moves only (N, K)
        # probabilities).
        t_eval = time.time()
        with _log_entry_and_exit("final val evaluation"):
            val_gts, val_ests, val_scores = self._evaluate_calibrated(
                clf_calibrated, labels.val
            )
        final_eval_s = time.time() - t_eval

        if self.resident_timings is not None:
            # Post-staging phase budget: how the non-staging train seconds
            # split across the epoch loop, calibration, and the final eval
            # (surfaced beside the staging components in resident/* and the
            # full-recipe record's train_stage_breakdown).
            self.resident_timings.update(
                {
                    "epochs_seconds": round(epochs_s, 1),
                    "epochs_run": float(max(epoch + 1 - start_epoch, 0)),
                    "calibration_seconds": round(calibration_s, 1),
                    "final_eval_seconds": round(final_eval_s, 1),
                }
            )

        # Evaluate previous classifiers on the validation set.
        pc_accs = []
        for pc_model in pc_models:
            pc_gts, pc_ests, _ = evaluate_classifier(
                pc_model, labels.val, batch_size=self.batch_size
            )
            pc_accs.append(float(accuracy_score(pc_gts, pc_ests)))

        val_results = ValResults(
            scores=val_scores,
            gt=[classes.index(member) for member in val_gts],
            est=[classes.index(member) for member in val_ests],
            classes=classes,
        )

        return_message = TrainClassifierReturnMsg(
            acc=float(accuracy_score(val_gts, val_ests)),
            pc_accs=pc_accs,
            ref_accs=ref_accs,
            runtime=time.time() - t0,
        )

        # The whole call (training + calibration + evaluation) succeeded —
        # only now has the checkpoint served its purpose. A preemption during
        # calibration/eval resumes from the final epoch, not epoch zero.
        self._clear_checkpoint()

        return clf_calibrated, val_results, return_message

    @staticmethod
    def _pretouch_parallel(arr: np.ndarray, workers: int) -> None:
        """First-touch every page of a fresh buffer, disjoint row-slabs in
        parallel. Faults against pages the guest already holds pipeline
        almost perfectly (2 GB in 0.6 s threaded vs 8-46 s serial, same
        weather windows); growth past the guest's high-water mark is
        rate-limited by the host granting memory and no thread count
        beats that (7.4 GB measured ~240 s in a bad window either way).
        Threaded is never slower than serial, so it is unconditional."""
        workers = max(int(workers), 1)
        n = arr.shape[0]
        if workers == 1 or n < workers:
            arr.fill(0.0)
            return
        from concurrent.futures import ThreadPoolExecutor

        step = -(-n // workers)
        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(
                lambda k: arr[k * step: (k + 1) * step].fill(0.0),
                range(workers),
            ))

    @staticmethod
    def _probe_feature_dim(split: ImageLabels) -> int:
        """Feature dimensionality from the split's first image (one small
        file read; the image is read again by load_into — negligible next
        to the thousands of reads it sizes the buffer for)."""
        first_key = sorted(split.data.keys())[0]
        x, _ = split.load_image_data(first_key)
        return int(x.shape[1])

    def _resident_offset(self, labels: ImageLabels) -> int | None:
        """This split's row offset into the combined resident buffer, or
        None when the run is not device-resident."""
        offsets = getattr(self, "_resident_split_offsets", None)
        if not offsets:
            return None
        for split_obj, pos in offsets.values():
            if split_obj is labels:
                return pos
        return None

    def resident_artifact_val_proba(
        self, clf, labels: ImageLabels, head_pytree: dict
    ) -> tuple[Any, list] | None:
        """Eval-the-artifact fast path: when ``labels`` lives in the
        resident buffer, run the SHIPPED head params over its span in one
        on-device gather + head_apply dispatch and return
        (val_proba float64, gt labels in canonical row order) — only the
        (N, K) probabilities cross back to the host. Returns None when the
        split is not resident (callers fall back to disk streaming).

        The canonical order here is iter_index_batches' order, which is
        load_data_in_batches' order by contract — so the matrix aligns
        with everything else the coordinator derives from the val split.
        """
        offset = self._resident_offset(labels)
        if offset is None:
            return None
        n = labels.label_count
        batch = next(iter(labels.iter_index_batches(batch_size=n)), None)
        if batch is None:
            return None
        idx, gt = batch
        proba = clf.predict_proba_resident_head(head_pytree, idx + offset)
        return proba, list(gt)

    def _iter_proba_batches(self, clf, labels: ImageLabels):
        """Yield (proba, y) per batch — device-resident gathers when the
        split lives in the resident buffer, disk streaming otherwise.
        Identical batch boundaries and label order either way."""
        offset = self._resident_offset(labels)
        if offset is not None:
            for idx, y in labels.iter_index_batches(batch_size=self.batch_size):
                yield clf.predict_proba_resident(idx + offset), y
        else:
            for x, y in labels.load_data_in_batches(batch_size=self.batch_size):
                yield clf.predict_proba(x), y

    def _evaluate_calibrated(
        self,
        clf_calibrated: CalibratedClassifier,
        labels: ImageLabels,
    ) -> tuple[list[str], list[str], list[float]]:
        """``evaluate_classifier`` with the resident fast path: when
        ``labels`` lives in the resident buffer, the uncalibrated scores
        come from the on-device gather (``predict_proba_resident``) and
        only (N, K) probabilities cross back — the disk-streamed path
        re-reads and re-uploads the full (N, 4096) f32 feature matrix
        (~735 MB at C2 scale). Identical batch boundaries, label order,
        and arithmetic: ``calibrate_scores`` is exactly what
        ``CalibratedClassifier.predict_proba`` applies after the estimator
        forward, and the resident forward is differential-tested bit-exact
        against ``predict_proba`` on the gathered rows
        (reference: trainer.py:271-292). Reduced-precision residency
        (bf16/int8) evaluates on the storage-rounded rows — the same rows
        every in-run eval, the calibration fit, and the artifact eval
        consumed — behind the house numerics band (differential-tested).
        Non-resident splits delegate to ``evaluate_classifier`` itself (one
        copy of the scores contract)."""
        if self._resident_offset(labels) is None:
            return evaluate_classifier(
                clf_calibrated, labels, batch_size=self.batch_size
            )
        classes = list(clf_calibrated.classes_)
        gts: list[str] = []
        ests: list[str] = []
        scores: list[float] = []
        for uncalibrated, y in self._iter_proba_batches(
            clf_calibrated.estimator, labels
        ):
            proba = clf_calibrated.calibrate_scores(uncalibrated)
            top = np.argmax(proba, axis=1)
            gts.extend(y)
            ests.extend(classes[i] for i in top)
            scores.extend(float(proba[i, j]) for i, j in enumerate(top))
        return gts, ests, scores

    def _resident_eval_batched(
        self,
        clf: MLPClassifier,
        labels: ImageLabels,
        cache: dict[int, list],
    ) -> tuple[float, float] | None:
        """Per-epoch (accuracy, uncalibrated log_loss) through the fused
        on-device eval when the split is resident — each batch dispatch
        reads back TWO float32 scalars instead of the (N, K) probability
        matrix (14.4 MB wire + two fresh ~29 MB float64 host allocations
        per epoch at C2 scale; under degraded tunnel links that readback
        dominated the epoch loop — the committed per-epoch wall times grew
        2 s → 9-11 s within one bad-window run). Returns None when the
        split is not resident (callers stream from disk).

        Accuracy is EXACT vs the streamed ``accuracy_score`` path (integer
        correct-count / N in float64); the loss is a float32 device
        reduction of sklearn's log_loss formula, value-close (~1e-6
        relative, differential-pinned) and decision-identical for early
        stopping (epoch separations are ~1e-3) — see
        _jitted_eval_resident's semantics contract. Batch boundaries are
        iter_index_batches' canonical order, cached across epochs (the
        split's rows and labels never change within a run; ``cache`` is
        scoped to one __call__, so stale classes_ can't leak across runs).
        """
        offset = self._resident_offset(labels)
        if offset is None:
            return None
        key = id(labels)
        batches = cache.get(key)
        if batches is None:
            class_pos = {c: i for i, c in enumerate(clf.classes_)}
            batches = []
            for idx, y in labels.iter_index_batches(batch_size=self.batch_size):
                y_idx = np.fromiter(
                    (class_pos.get(v, -1) for v in y),
                    dtype=np.int32,
                    count=len(y),
                )
                batches.append(
                    (np.asarray(idx, dtype=np.int32) + offset, y_idx)
                )
            cache[key] = batches
        correct = 0.0
        neg_log_sum = 0.0
        total = 0
        for idx_arr, y_arr in batches:
            counts = clf.eval_counts_resident(idx_arr, y_arr)
            correct += float(counts[0])
            neg_log_sum += float(counts[1])
            total += int(idx_arr.shape[0])
        if total == 0:
            return None
        return correct / total, neg_log_sum / total

    def _calc_acc_batched(self, clf: MLPClassifier, labels: ImageLabels) -> float:
        """Streamed accuracy: only predictions accumulate, not features
        (reference: trainer.py:295-307). When the split is resident the
        argmax happens on device and only (N,) int32 predictions cross
        back — bit-identical to argmax over the probability matrix
        (_jitted_predict_resident), without its per-epoch readback and
        fresh float64 host allocations."""
        gt: list[str] = []
        pred: list[str] = []
        clf_classes = np.asarray(clf.classes_)
        offset = self._resident_offset(labels)
        if offset is not None:
            for idx, y in labels.iter_index_batches(batch_size=self.batch_size):
                pred.extend(clf_classes[clf.predict_indices_resident(idx + offset)])
                gt.extend(y)
            return float(accuracy_score(gt, pred))
        for proba, y in self._iter_proba_batches(clf, labels):
            pred.extend(clf_classes[np.argmax(proba, axis=1)])
            gt.extend(y)
        return float(accuracy_score(gt, pred))

    def _calc_acc_and_log_loss_batched(
        self,
        clf: MLPClassifier,
        labels: ImageLabels,
        classes_list: list[Any],
    ) -> tuple[float, float]:
        """Streamed accuracy AND log_loss in one pass
        (reference: trainer.py:309-342)."""
        gt: list[Any] = []
        all_proba: list[np.ndarray] = []
        for proba, y in self._iter_proba_batches(clf, labels):
            all_proba.append(proba)
            gt.extend(y)
        # vstack of a single batch would copy the whole (N, K) float64
        # matrix — a fresh ~29 MB host allocation per epoch at C2 scale
        # (fresh pages are the weather-bound resource, CLAUDE.md).
        proba = all_proba[0] if len(all_proba) == 1 else np.vstack(all_proba)
        clf_classes = list(clf.classes_)
        pred = [clf_classes[i] for i in proba.argmax(axis=1)]
        acc = float(accuracy_score(gt, pred))
        # Explicit labels= keeps column ordering correct when some classes
        # are absent from this eval set.
        loss = float(sklearn_log_loss(gt, proba, labels=clf_classes))
        return acc, loss

    def _calibrate_in_batches(
        self,
        clf: MLPClassifier,
        ref_labels: ImageLabels,
    ) -> CalibratedClassifier:
        """Platt calibration from streamed uncalibrated scores
        (reference: trainer.py:344-396)."""
        all_preds: list[np.ndarray] = []
        all_y: list[np.ndarray] = []

        for preds, y_batch in self._iter_proba_batches(clf, ref_labels):
            # Binary: _fit-style calibration expects just the positive-class
            # column (reference: trainer.py:366-374).
            if len(clf.classes_) == 2:
                preds = preds[:, 1:]
            all_preds.append(preds)
            all_y.append(np.asarray(y_batch))

        predictions = np.vstack(all_preds)
        y = np.concatenate(all_y)
        if self.calibration_method == "temperature":
            # Shares the sigmoid fitter's input contract, including the
            # binary (N, 1) positive-column form (expanded internally).
            return TemperatureCalibratedClassifier.fit_from_scores(
                clf, predictions, y
            )
        return CalibratedClassifier.fit_from_scores(
            clf, predictions, y, backend=self.calibration_backend
        )

    def serialize(self) -> dict[str, Any]:
        return {
            "trainer": type(self).__name__,
            "batch_size": self.batch_size,
            # on_epoch_end is not JSON-serializable; excluded.
        }
