"""Trainer tests: end-to-end run, early-stopping behavior matrix, batched
calibration equivalence (reference analog: tests/pyspacer/test_trainer.py)."""

import numpy as np
import pytest

from mermaid_classifier_tpu.data.labels import (
    evaluate_classifier,
    preprocess_labels,
)
from mermaid_classifier_tpu.train.calibration import (
    CalibratedClassifier,
    TemperatureCalibratedClassifier,
)
from mermaid_classifier_tpu.train.mlp_classifier import MLPClassifier
from mermaid_classifier_tpu.train.trainer import MermaidTrainer

from tests.data.test_labels import build_synthetic_labels


class SmallNetTrainer(MermaidTrainer):
    """Production arch shrunk for seconds-fast tests; semantics unchanged."""

    def _make_classifier(self, class_weight):
        return MLPClassifier(
            hidden_layer_sizes=(16,),
            learning_rate_init=1e-2,
            class_weight=class_weight,
            random_state=0,
        )


@pytest.fixture()
def task_labels(tmp_path):
    labels, _ = build_synthetic_labels(
        tmp_path, n_images=40, pts_per_image=10, n_classes=3, dim=8, seed=0
    )
    return preprocess_labels(labels, split_ratios=(0.15, 0.15))


class TestEndToEnd:
    def test_training_run(self, task_labels):
        epochs_seen = []
        trainer = SmallNetTrainer(
            batch_size=64, on_epoch_end=lambda m: epochs_seen.append(m)
        )
        clf_cal, val_results, msg = trainer(task_labels, nbr_epochs=8, pc_models=[])

        assert isinstance(clf_cal, CalibratedClassifier)
        assert len(msg.ref_accs) == 8
        assert msg.acc > 0.8  # separable clusters
        assert msg.runtime > 0
        assert len(epochs_seen) == 8
        # One-shot summary fields only on the final epoch.
        assert "final_epoch" not in epochs_seen[0]
        assert epochs_seen[-1]["final_epoch"] == 8
        assert epochs_seen[-1]["early_stopped"] is False
        # ValResults indices are consistent.
        n_val = task_labels.val.label_count
        assert len(val_results.scores) == n_val
        assert val_results.classes == sorted(task_labels.ref.classes_set)

        info = trainer._early_stop_info
        assert info["enabled"] is False
        assert info["stop_reason"] == "budget_exhausted"
        assert info["final_epoch"] == 8

    def test_previous_classifier_accs(self, task_labels):
        trainer = SmallNetTrainer(batch_size=64)
        clf_cal, _, _ = trainer(task_labels, nbr_epochs=4, pc_models=[])
        _, _, msg = trainer(task_labels, nbr_epochs=2, pc_models=[clf_cal])
        assert len(msg.pc_accs) == 1
        assert 0.0 <= msg.pc_accs[0] <= 1.0

    def test_class_weight_passthrough(self, task_labels):
        classes = sorted(task_labels.ref.classes_set)
        weights = {c: 1.0 for c in classes}
        trainer = SmallNetTrainer(batch_size=64, class_weight=weights)
        clf_cal, _, msg = trainer(task_labels, nbr_epochs=3, pc_models=[])
        assert msg.acc > 0.5

    def test_invalid_patience(self):
        with pytest.raises(ValueError, match="early_stopping_patience"):
            MermaidTrainer(batch_size=10, early_stopping_patience=0)


class ScriptedValLossTrainer(SmallNetTrainer):
    """Overrides the val metric with a scripted loss sequence so the
    early-stopping state machine is testable deterministically
    (reference analog: tests/pyspacer/test_trainer.py:192-358)."""

    def __init__(self, scripted_losses, **kwargs):
        super().__init__(**kwargs)
        self.scripted_losses = list(scripted_losses)
        self._call_idx = 0

    def _calc_acc_and_log_loss_batched(self, clf, labels, classes_list):
        loss = self.scripted_losses[self._call_idx]
        self._call_idx += 1
        return 0.5, loss

    def _resident_eval_batched(self, clf, labels, cache):
        # The resident epoch loop computes the val metric through the
        # fused device eval, not _calc_acc_and_log_loss_batched — script
        # that pass identically (ref passes keep the real eval).
        offsets = self._resident_split_offsets or {}
        val_split = offsets.get("val", (None, 0))[0]
        if labels is val_split:
            loss = self.scripted_losses[self._call_idx]
            self._call_idx += 1
            return 0.5, loss
        return super()._resident_eval_batched(clf, labels, cache)


class TestEarlyStopping:
    def test_stops_on_patience(self, task_labels):
        # best at epoch 2 (idx 1), then two non-improving epochs → stop at 4.
        trainer = ScriptedValLossTrainer(
            [0.5, 0.4, 0.6, 0.7, 0.3, 0.2],
            batch_size=64,
            early_stopping_patience=2,
        )
        clf_cal, _, _ = trainer(task_labels, nbr_epochs=6, pc_models=[])
        info = trainer._early_stop_info
        assert info["stop_reason"] == "early_stopping"
        assert info["final_epoch"] == 4
        assert info["best_val_epoch"] == 2
        assert info["best_val_loss"] == 0.4
        # Restored classifier is the epoch-2 snapshot: it saw exactly 2
        # epochs of partial_fit batches.
        n_batches_per_epoch = len(
            list(task_labels.train.load_data_in_batches(batch_size=64, random_seed=0))
        )
        assert clf_cal.estimator.n_iter_ == 2 * n_batches_per_epoch

    def test_budget_exhausted_still_restores_best(self, task_labels):
        trainer = ScriptedValLossTrainer(
            [0.5, 0.3, 0.6, 0.55],
            batch_size=64,
            early_stopping_patience=5,
        )
        clf_cal, _, _ = trainer(task_labels, nbr_epochs=4, pc_models=[])
        info = trainer._early_stop_info
        assert info["stop_reason"] == "budget_exhausted"
        assert info["final_epoch"] == 4
        assert info["best_val_epoch"] == 2
        n_batches_per_epoch = len(
            list(task_labels.train.load_data_in_batches(batch_size=64, random_seed=0))
        )
        assert clf_cal.estimator.n_iter_ == 2 * n_batches_per_epoch

    def test_no_restore_when_last_is_best(self, task_labels):
        trainer = ScriptedValLossTrainer(
            [0.5, 0.4, 0.3],
            batch_size=64,
            early_stopping_patience=2,
        )
        clf_cal, _, _ = trainer(task_labels, nbr_epochs=3, pc_models=[])
        info = trainer._early_stop_info
        assert info["best_val_epoch"] == 3
        n_batches_per_epoch = len(
            list(task_labels.train.load_data_in_batches(batch_size=64, random_seed=0))
        )
        assert clf_cal.estimator.n_iter_ == 3 * n_batches_per_epoch

    def test_callback_summary_fields_on_early_stop(self, task_labels):
        seen = []
        trainer = ScriptedValLossTrainer(
            [0.5, 0.6, 0.7],
            batch_size=64,
            early_stopping_patience=2,
            on_epoch_end=seen.append,
        )
        trainer(task_labels, nbr_epochs=10, pc_models=[])
        assert len(seen) == 3
        assert "final_epoch" not in seen[0]
        assert seen[-1]["early_stopped"] is True
        assert seen[-1]["best_val_epoch"] == 1


class TestBatchedCalibration:
    def test_batched_equals_whole(self, task_labels):
        """Calibrating from streamed batches must equal calibrating from the
        whole ref set at once (reference: test_trainer.py:104-118)."""
        trainer = SmallNetTrainer(batch_size=32)
        clf_cal, _, _ = trainer(task_labels, nbr_epochs=4, pc_models=[])

        clf = clf_cal.estimator
        x_ref, y_ref = task_labels.ref.load_all()
        whole = CalibratedClassifier.fit_from_scores(
            clf, clf.predict_proba(x_ref), np.asarray(y_ref)
        )
        # Streaming order differs from load_all order only in grouping, not
        # content; per-class sigmoid params must agree tightly.
        np.testing.assert_allclose(
            clf_cal.calibration_a_, whole.calibration_a_, rtol=1e-8
        )
        np.testing.assert_allclose(
            clf_cal.calibration_b_, whole.calibration_b_, rtol=1e-8
        )


class TestTemperatureCalibrationMethod:
    def test_trainer_produces_temperature_calibrator(self, task_labels):
        """calibration_method='temperature' swaps the calibration family;
        the streamed fit equals a whole-ref-set fit and the ref-split NLL
        is no worse than uncalibrated (the fit guarantee)."""
        import sklearn.metrics

        trainer = SmallNetTrainer(
            batch_size=32, calibration_method="temperature"
        )
        clf_cal, val_results, msg = trainer(
            task_labels, nbr_epochs=4, pc_models=[]
        )
        assert isinstance(clf_cal, TemperatureCalibratedClassifier)

        clf = clf_cal.estimator
        x_ref, y_ref = task_labels.ref.load_all()
        uncal = clf.predict_proba(x_ref)
        whole = TemperatureCalibratedClassifier.fit_from_scores(
            clf, uncal, np.asarray(y_ref)
        )
        assert clf_cal.temperature_ == pytest.approx(
            whole.temperature_, rel=1e-6
        )
        labels_sorted = sorted(set(y_ref))
        nll_uncal = sklearn.metrics.log_loss(
            y_ref, uncal, labels=labels_sorted
        )
        nll_temp = sklearn.metrics.log_loss(
            y_ref, clf_cal.calibrate_scores(uncal), labels=labels_sorted
        )
        assert nll_temp <= nll_uncal + 1e-9

    def test_invalid_method_rejected(self):
        with pytest.raises(ValueError, match="calibration_method"):
            MermaidTrainer(batch_size=10, calibration_method="platt")


class TestCheckpointResume:
    """Crash-resume must be bit-identical to an uninterrupted run — the
    capability the reference lacks (SURVEY.md §5.3: a spot interruption
    restarts from epoch zero)."""

    def test_resume_is_bit_identical(self, task_labels, tmp_path):
        # Uninterrupted reference run.
        straight = SmallNetTrainer(batch_size=64)
        clf_a, _, msg_a = straight(task_labels, nbr_epochs=6, pc_models=[])

        # Interrupted run: crash out of the epoch loop after epoch 2's
        # checkpoint (simulated via the on_epoch_end hook), then resume.
        ckpt = tmp_path / "ckpt"

        class Crash(RuntimeError):
            pass

        def crash_cb(metrics):
            if metrics["epoch"] == 2:
                raise Crash()

        interrupted = SmallNetTrainer(
            batch_size=64, checkpoint_dir=str(ckpt), on_epoch_end=crash_cb
        )
        with pytest.raises(Crash):
            interrupted(task_labels, nbr_epochs=6, pc_models=[])
        assert (ckpt / "trainer_checkpoint.pkl").is_file()

        resumed = SmallNetTrainer(batch_size=64, checkpoint_dir=str(ckpt))
        clf_b, _, msg_b = resumed(task_labels, nbr_epochs=6, pc_models=[])

        # Identical loss curves, accuracies, and final calibrated params.
        est_a, est_b = clf_a.estimator, clf_b.estimator
        assert est_a.loss_curve_ == pytest.approx(est_b.loss_curve_)
        assert msg_a.ref_accs == pytest.approx(msg_b.ref_accs)
        for wa, wb in zip(est_a.coefs_, est_b.coefs_):
            np.testing.assert_array_equal(wa, wb)
        np.testing.assert_array_equal(
            clf_a.calibration_a_, clf_b.calibration_a_
        )
        # Checkpoint is cleared after a successful run.
        assert not (ckpt / "trainer_checkpoint.pkl").exists()

    def test_resume_preserves_early_stopping_state(self, task_labels, tmp_path):
        ckpt = tmp_path / "ckpt"

        class Crash(RuntimeError):
            pass

        def crash_cb(metrics):
            if metrics["epoch"] == 3:
                raise Crash()

        interrupted = SmallNetTrainer(
            batch_size=64,
            checkpoint_dir=str(ckpt),
            early_stopping_patience=2,
            on_epoch_end=crash_cb,
        )
        with pytest.raises(Crash):
            interrupted(task_labels, nbr_epochs=10, pc_models=[])

        resumed = SmallNetTrainer(
            batch_size=64, checkpoint_dir=str(ckpt), early_stopping_patience=2
        )
        _, _, msg = resumed(task_labels, nbr_epochs=10, pc_models=[])
        straight = SmallNetTrainer(batch_size=64, early_stopping_patience=2)
        _, _, msg_ref = straight(task_labels, nbr_epochs=10, pc_models=[])
        assert resumed._early_stop_info == straight._early_stop_info
        assert msg.ref_accs == pytest.approx(msg_ref.ref_accs)

    def test_resume_of_finished_budget_trains_nothing(self, task_labels, tmp_path):
        ckpt = tmp_path / "ckpt"

        class Crash(RuntimeError):
            pass

        def crash_cb(metrics):
            if metrics["epoch"] == 3:  # checkpoint for epoch 4 written
                raise Crash()

        interrupted = SmallNetTrainer(
            batch_size=64, checkpoint_dir=str(ckpt), on_epoch_end=crash_cb
        )
        with pytest.raises(Crash):
            interrupted(task_labels, nbr_epochs=4, pc_models=[])
        resumed = SmallNetTrainer(batch_size=64, checkpoint_dir=str(ckpt))
        _, _, msg = resumed(task_labels, nbr_epochs=4, pc_models=[])
        # All four epochs came from the checkpointed state.
        assert len(msg.ref_accs) == 4
        assert resumed._early_stop_info["final_epoch"] == 4

    def test_resume_device_resident_int8_restores_best_snapshot(
        self, task_labels, tmp_path
    ):
        """Regression: a checkpoint-restored best snapshot carries
        _resident_dtype='int8' through pickling but no buffers; early
        stopping after resume restores that snapshot, and the resident
        calibration/eval passes must get the buffer AND its per-row scale
        re-attached (the scale was forgotten once: AttributeError in
        predict_proba_resident)."""
        ckpt = tmp_path / "ckpt"

        class Crash(RuntimeError):
            pass

        def crash_cb(metrics):
            if metrics["epoch"] == 3:
                raise Crash()

        # Scripted losses: best at epoch 2, worse after — so the resumed
        # run early-stops and restores the epoch-2 snapshot, which came
        # FROM THE CHECKPOINT (written before the crash at epoch 3).
        interrupted = ScriptedValLossTrainer(
            [0.5, 0.4, 0.6, 0.7, 0.8],
            batch_size=64,
            checkpoint_dir=str(ckpt),
            early_stopping_patience=2,
            device_resident=True,
            resident_dtype="int8",
            on_epoch_end=crash_cb,
        )
        with pytest.raises(Crash):
            interrupted(task_labels, nbr_epochs=10, pc_models=[])

        resumed = ScriptedValLossTrainer(
            # epochs 4+: never improving on epoch 2's 0.4, so patience 2
            # stops the resumed run and restores the epoch-2 snapshot.
            [0.7, 0.8, 0.9, 1.0, 1.1, 1.2, 1.3],
            batch_size=64,
            checkpoint_dir=str(ckpt),
            early_stopping_patience=2,
            device_resident=True,
            resident_dtype="int8",
        )
        clf_cal, _, msg = resumed(task_labels, nbr_epochs=10, pc_models=[])
        info = resumed._early_stop_info
        assert info["stop_reason"] == "early_stopping"
        assert info["best_val_epoch"] == 2
        # The restored snapshot's resident state is fully re-attached.
        est = clf_cal.estimator
        assert est._resident_X is not None
        assert est._resident_scale is not None
        assert est._resident_dtype == "int8"
        assert np.isfinite(msg.acc)

    def test_refuses_checkpoint_from_different_run(self, task_labels, tmp_path):
        """A checkpoint_dir reused with a different configuration must refuse
        to resume — otherwise stale weights silently continue training."""
        from mermaid_classifier_tpu.train.trainer import CheckpointMismatchError

        ckpt = tmp_path / "ckpt"

        class Crash(RuntimeError):
            pass

        def crash_cb(metrics):
            if metrics["epoch"] == 1:
                raise Crash()

        interrupted = SmallNetTrainer(
            batch_size=64, checkpoint_dir=str(ckpt), on_epoch_end=crash_cb
        )
        with pytest.raises(Crash):
            interrupted(task_labels, nbr_epochs=4, pc_models=[])

        # Different batch size → refuse.
        with pytest.raises(CheckpointMismatchError, match="different run"):
            SmallNetTrainer(batch_size=32, checkpoint_dir=str(ckpt))(
                task_labels, nbr_epochs=4, pc_models=[]
            )

        # Different architecture → refuse.
        class OtherArchTrainer(MermaidTrainer):
            def _make_classifier(self, class_weight):
                return MLPClassifier(
                    hidden_layer_sizes=(8, 8),
                    learning_rate_init=1e-2,
                    class_weight=class_weight,
                    random_state=0,
                )

        with pytest.raises(CheckpointMismatchError, match="different run"):
            OtherArchTrainer(batch_size=64, checkpoint_dir=str(ckpt))(
                task_labels, nbr_epochs=4, pc_models=[]
            )

        # Matching configuration still resumes fine.
        resumed = SmallNetTrainer(batch_size=64, checkpoint_dir=str(ckpt))
        _, _, msg = resumed(task_labels, nbr_epochs=4, pc_models=[])
        assert len(msg.ref_accs) == 4


class TestMeshTrainer:
    def test_mesh_trainer_matches_single_device(self, task_labels):
        from mermaid_classifier_tpu.parallel.mesh import make_mesh

        class MeshSmallNetTrainer(SmallNetTrainer):
            def _make_classifier(self, class_weight):
                clf = super()._make_classifier(class_weight)
                clf.mesh = self.mesh
                return clf

        plain = SmallNetTrainer(batch_size=64)
        _, _, msg_a = plain(task_labels, nbr_epochs=3, pc_models=[])
        sharded = MeshSmallNetTrainer(batch_size=64, mesh=make_mesh(8))
        _, _, msg_b = sharded(task_labels, nbr_epochs=3, pc_models=[])
        assert msg_a.ref_accs == pytest.approx(msg_b.ref_accs, abs=1e-6)
        assert msg_a.acc == pytest.approx(msg_b.acc, abs=1e-6)


class TestDeviceResidentTrainer:
    """device_resident=True pins the train features on device and gathers
    per-epoch batches by index — end metrics must be BIT-IDENTICAL to the
    streamed trainer (house differential style)."""

    def test_resident_matches_streamed(self, task_labels):
        streamed = SmallNetTrainer(batch_size=64, early_stopping_patience=3)
        clf_a, _, msg_a = streamed(task_labels, nbr_epochs=6, pc_models=[])
        resident = SmallNetTrainer(
            batch_size=64, early_stopping_patience=3, device_resident=True
        )
        clf_b, _, msg_b = resident(task_labels, nbr_epochs=6, pc_models=[])

        assert msg_a.ref_accs == msg_b.ref_accs
        # The fused device eval computes the early-stopping statistic in
        # float32 (two scalars cross back per epoch instead of the (N, K)
        # matrix) — value-close, decision-identical: every structural
        # field of the early-stop record must match EXACTLY, the loss
        # value within the float32-reduction band
        # (see _jitted_eval_resident's semantics contract).
        info_a = dict(streamed._early_stop_info)
        info_b = dict(resident._early_stop_info)
        loss_a = info_a.pop("best_val_loss")
        loss_b = info_b.pop("best_val_loss")
        assert info_a == info_b
        assert loss_b == pytest.approx(loss_a, rel=1e-4)
        est_a, est_b = clf_a.estimator, clf_b.estimator
        assert est_a.loss_curve_ == est_b.loss_curve_
        for wa, wb in zip(est_a.coefs_, est_b.coefs_):
            np.testing.assert_array_equal(wa, wb)
        np.testing.assert_array_equal(
            clf_a.calibration_a_, clf_b.calibration_a_
        )

    def test_resident_bf16_close_to_streamed(self, task_labels):
        """resident_dtype='bfloat16' stores the pinned features half-size;
        only the storage rounding may move the metrics — accuracies stay
        within a tight band of the streamed f32 run."""
        streamed = SmallNetTrainer(batch_size=64, early_stopping_patience=3)
        _, _, msg_a = streamed(task_labels, nbr_epochs=4, pc_models=[])
        resident = SmallNetTrainer(
            batch_size=64, early_stopping_patience=3, device_resident=True,
            resident_dtype="bfloat16",
        )
        clf_b, _, msg_b = resident(task_labels, nbr_epochs=4, pc_models=[])
        assert str(clf_b.estimator._resident_X.dtype) == "bfloat16"
        assert msg_a.acc == pytest.approx(msg_b.acc, abs=0.05)
        np.testing.assert_allclose(
            msg_a.ref_accs, msg_b.ref_accs, atol=0.05
        )

    def test_resident_int8_close_to_streamed(self, task_labels):
        """resident_dtype='int8' stores the pinned features quarter-size
        (per-row scales, dequant after the on-device gather); only the
        storage rounding may move the metrics — accuracies stay within a
        tight band of the streamed f32 run."""
        streamed = SmallNetTrainer(batch_size=64, early_stopping_patience=3)
        _, _, msg_a = streamed(task_labels, nbr_epochs=4, pc_models=[])
        resident = SmallNetTrainer(
            batch_size=64, early_stopping_patience=3, device_resident=True,
            resident_dtype="int8",
        )
        clf_b, _, msg_b = resident(task_labels, nbr_epochs=4, pc_models=[])
        assert str(clf_b.estimator._resident_X.dtype) == "int8"
        assert msg_a.acc == pytest.approx(msg_b.acc, abs=0.05)
        np.testing.assert_allclose(
            msg_a.ref_accs, msg_b.ref_accs, atol=0.05
        )

    def test_storage_dtype_staging_bits_match_f32_path(self, task_labels):
        """The trainer stages the resident buffer directly in the storage
        dtype (int8 quantized inline with the parallel reads; bf16 cast
        on assignment) — the buffer bits and scales must equal staging
        the f32 matrix first and converting through
        set_resident_features, for BOTH dtypes."""
        for rdtype in ("int8", "bfloat16"):
            trainer = SmallNetTrainer(
                batch_size=64, device_resident=True, resident_dtype=rdtype
            )
            clf_cal, _, _ = trainer(task_labels, nbr_epochs=1, pc_models=[])
            est = clf_cal.estimator

            # Reference: stage f32 spans in the same [train|ref|val]
            # canonical layout, then convert via the direct API.
            dim = est._resident_X.shape[1]
            spans = [
                s for s in (
                    task_labels.train, task_labels.ref, task_labels.val
                ) if len(s)
            ]
            pos = sum(s.label_count for s in spans)
            f32 = np.empty((pos, dim), np.float32)
            off = 0
            for s in spans:
                s.load_into(f32, off)
                off += s.label_count
            ref = MLPClassifier((8,), random_state=0)
            ref.set_resident_features(f32, dtype=rdtype)

            np.testing.assert_array_equal(
                np.asarray(est._resident_X).view(np.uint8),
                np.asarray(ref._resident_X).view(np.uint8),
                err_msg=rdtype,
            )
            if rdtype == "int8":
                np.testing.assert_array_equal(
                    np.asarray(est._resident_scale),
                    np.asarray(ref._resident_scale),
                )

    def test_resident_artifact_val_proba_matches_disk_streaming(
        self, task_labels, tmp_path
    ):
        """Eval-the-artifact fast path: gathering the val span from the
        resident buffer and applying the SHIPPED head params on device
        must reproduce the loaded Predictor's disk-streamed predict_proba
        — same rows, same order, same math."""
        from mermaid_classifier_tpu.inference.export import export_artifact
        from mermaid_classifier_tpu.inference.loader import load_predictor

        trainer = SmallNetTrainer(batch_size=64, device_resident=True)
        clf_cal, _, _ = trainer(task_labels, nbr_epochs=3, pc_models=[])
        X_ref, _ = next(
            iter(task_labels.val.load_data_in_batches(batch_size=5000))
        )
        export_artifact(clf_cal, tmp_path, X_ref)
        predictor = load_predictor(tmp_path)

        res = trainer.resident_artifact_val_proba(
            clf_cal.estimator, task_labels.val,
            predictor.head_params.as_pytree(),
        )
        assert res is not None
        proba_res, gt_res = res

        all_proba, all_gt = [], []
        for x, y in task_labels.val.load_data_in_batches(batch_size=5000):
            all_proba.append(predictor.predict_proba(x))
            all_gt.extend(y)
        proba_disk = np.vstack(all_proba)

        assert gt_res == all_gt
        np.testing.assert_allclose(proba_res, proba_disk, atol=1e-6)

    def test_resident_artifact_val_proba_int8_band(self, task_labels, tmp_path):
        """int8 storage feeds the artifact eval storage-rounded rows (the
        same rows every in-run eval used); agreement with exact-feature
        serving is a quality band, not bit equality."""
        from mermaid_classifier_tpu.inference.export import export_artifact
        from mermaid_classifier_tpu.inference.loader import load_predictor

        trainer = SmallNetTrainer(
            batch_size=64, device_resident=True, resident_dtype="int8"
        )
        clf_cal, _, _ = trainer(task_labels, nbr_epochs=3, pc_models=[])
        X_ref, _ = next(
            iter(task_labels.val.load_data_in_batches(batch_size=5000))
        )
        export_artifact(clf_cal, tmp_path, X_ref)
        predictor = load_predictor(tmp_path)
        res = trainer.resident_artifact_val_proba(
            clf_cal.estimator, task_labels.val,
            predictor.head_params.as_pytree(),
        )
        assert res is not None
        proba_res, gt_res = res
        all_proba, all_gt = [], []
        for x, y in task_labels.val.load_data_in_batches(batch_size=5000):
            all_proba.append(predictor.predict_proba(x))
            all_gt.extend(y)
        proba_disk = np.vstack(all_proba)
        assert gt_res == all_gt
        num = np.sum(proba_res * proba_disk, axis=1)
        den = (
            np.linalg.norm(proba_res, axis=1)
            * np.linalg.norm(proba_disk, axis=1)
        )
        assert float(np.min(num / np.maximum(den, 1e-12))) >= 0.999

    def test_resident_artifact_val_proba_none_when_streamed(self, task_labels):
        trainer = SmallNetTrainer(batch_size=64)  # not device-resident
        clf_cal, _, _ = trainer(task_labels, nbr_epochs=2, pc_models=[])
        assert trainer.resident_artifact_val_proba(
            clf_cal.estimator, task_labels.val, {}
        ) is None

    def test_final_eval_resident_matches_disk_streaming(self, task_labels):
        """The trainer's final calibrated-model eval gathers val rows from
        the resident buffer (only (N, K) probabilities cross back); for
        f32 storage its ValResults must reproduce the disk-streamed
        evaluate_classifier bit-for-bit."""
        trainer = SmallNetTrainer(batch_size=64, device_resident=True)
        clf_cal, val_results, _ = trainer(
            task_labels, nbr_epochs=3, pc_models=[]
        )
        gts, ests, scores = evaluate_classifier(
            clf_cal, task_labels.val, batch_size=64
        )
        classes = list(clf_cal.classes_)
        assert val_results.gt == [classes.index(g) for g in gts]
        assert val_results.est == [classes.index(e) for e in ests]
        np.testing.assert_array_equal(val_results.scores, scores)

    def test_final_eval_resident_int8_band(self, task_labels):
        """int8 residency evaluates the calibrated model on the
        storage-rounded rows (the same rows training, calibration, and
        the artifact eval consumed) — agreement with the exact-feature
        disk-streamed eval is a quality band, not bit equality."""
        trainer = SmallNetTrainer(
            batch_size=64, device_resident=True, resident_dtype="int8"
        )
        clf_cal, val_results, msg = trainer(
            task_labels, nbr_epochs=3, pc_models=[]
        )
        gts, ests, _ = evaluate_classifier(
            clf_cal, task_labels.val, batch_size=64
        )
        classes = list(clf_cal.classes_)
        assert val_results.gt == [classes.index(g) for g in gts]
        acc_disk = float(np.mean(np.asarray(ests) == np.asarray(gts)))
        assert msg.acc == pytest.approx(acc_disk, abs=0.05)

    def test_phase_timings_recorded(self, task_labels):
        """The post-staging phase budget (epoch loop / calibration /
        final eval) joins the resident stage budget so full-recipe
        records decompose the whole train stage."""
        trainer = SmallNetTrainer(batch_size=64, device_resident=True)
        trainer(task_labels, nbr_epochs=2, pc_models=[])
        t = trainer.resident_timings
        assert t is not None
        assert t["epochs_run"] == 2.0
        assert t["epochs_seconds"] >= 0.0
        assert t["calibration_seconds"] >= 0.0
        assert t["final_eval_seconds"] >= 0.0

    def test_device_calibration_backend_close_to_scipy(self, task_labels):
        """calibration_backend='device' routes the Platt fits through the
        batched Newton solve; end metrics and calibrators stay within the
        fit-precision band of the scipy run (training itself is identical
        — same seeds, same weights)."""
        scipy_run = SmallNetTrainer(batch_size=64)
        clf_a, _, msg_a = scipy_run(task_labels, nbr_epochs=3, pc_models=[])
        device_run = SmallNetTrainer(
            batch_size=64, calibration_backend="device"
        )
        clf_b, _, msg_b = device_run(task_labels, nbr_epochs=3, pc_models=[])
        for wa, wb in zip(clf_a.estimator.coefs_, clf_b.estimator.coefs_):
            np.testing.assert_array_equal(wa, wb)
        np.testing.assert_allclose(
            clf_b.calibration_a_, clf_a.calibration_a_, rtol=2e-3, atol=2e-4
        )
        np.testing.assert_allclose(
            clf_b.calibration_b_, clf_a.calibration_b_, rtol=2e-3, atol=2e-4
        )
        assert msg_a.acc == pytest.approx(msg_b.acc, abs=1e-3)

    def test_cross_mode_resume_is_identical(self, task_labels, tmp_path):
        """A run checkpointed in streamed mode resumes bit-identically in
        resident mode — the checkpoint carries model state, never data."""
        straight = SmallNetTrainer(batch_size=64)
        clf_a, _, msg_a = straight(task_labels, nbr_epochs=5, pc_models=[])

        ckpt = tmp_path / "ckpt"

        class Crash(RuntimeError):
            pass

        def crash_cb(metrics):
            if metrics["epoch"] == 2:
                raise Crash()

        interrupted = SmallNetTrainer(
            batch_size=64, checkpoint_dir=str(ckpt), on_epoch_end=crash_cb
        )
        with pytest.raises(Crash):
            interrupted(task_labels, nbr_epochs=5, pc_models=[])

        resumed = SmallNetTrainer(
            batch_size=64, checkpoint_dir=str(ckpt), device_resident=True
        )
        clf_b, _, msg_b = resumed(task_labels, nbr_epochs=5, pc_models=[])
        assert msg_a.ref_accs == pytest.approx(msg_b.ref_accs)
        for wa, wb in zip(clf_a.estimator.coefs_, clf_b.estimator.coefs_):
            np.testing.assert_array_equal(wa, wb)


def test_resident_timings_recorded(task_labels):
    """The resident stage budget (disk load / upload / AOT warm) must be
    machine-readable after the call — the runner logs it as resident/*
    metrics and the full-recipe drive surfaces it in its JSON."""
    trainer = SmallNetTrainer(batch_size=64, device_resident=True)
    trainer(task_labels, nbr_epochs=2, pc_models=[])
    t = trainer.resident_timings
    assert t is not None
    assert t["warm_epoch_programs"] >= 1
    assert t["warm_forward_programs"] >= 1
    assert t["load_seconds"] >= 0.0
    assert t["upload_stage_seconds"] >= 0.0
    # Pipelined upload: the serialized tail can never exceed the upload
    # thread's lifetime (it is the part that outlived the disk fill).
    assert 0.0 <= t["upload_extra_wait_seconds"] <= t["upload_stage_seconds"] + 0.2
    assert t["rows"] == task_labels.label_count

    streamed = SmallNetTrainer(batch_size=64)
    streamed(task_labels, nbr_epochs=2, pc_models=[])
    assert streamed.resident_timings is None


class TestFilledPrefix:
    """The fill->upload watermark: out-of-order spans, blocking waits, and
    failure propagation (an uploader waiting on a dead fill must raise,
    never hang)."""

    def test_out_of_order_spans_advance_contiguously(self):
        from mermaid_classifier_tpu.train.trainer import _FilledPrefix

        t = _FilledPrefix(10)
        t.add(4, 3)          # [4,7) pending — prefix still 0
        assert t._watermark == 0
        t.add(0, 4)          # [0,4) lands -> merges through [4,7)
        assert t._watermark == 7
        t.add(7, 3)
        assert t._watermark == 10
        t.wait(10)           # returns immediately

    def test_wait_blocks_until_published(self):
        import threading
        import time as _time

        from mermaid_classifier_tpu.train.trainer import _FilledPrefix

        t = _FilledPrefix(6)
        seen = []

        def waiter():
            t.wait(6)
            seen.append("done")

        th = threading.Thread(target=waiter, daemon=True)
        th.start()
        _time.sleep(0.05)
        assert seen == []    # still blocked
        t.add(0, 3)
        t.add(3, 3)
        th.join(timeout=5)
        assert seen == ["done"]

    def test_wait_clamps_to_total(self):
        from mermaid_classifier_tpu.train.trainer import _FilledPrefix

        t = _FilledPrefix(4)
        t.add(0, 4)
        t.wait(10**9)        # requests beyond total clamp to total

    def test_fail_aborts_waiters(self):
        import threading

        from mermaid_classifier_tpu.train.trainer import _FilledPrefix

        t = _FilledPrefix(8)
        errs = []

        def waiter():
            try:
                t.wait(8)
            except RuntimeError as exc:
                errs.append(exc)

        th = threading.Thread(target=waiter, daemon=True)
        th.start()
        t.fail(FileNotFoundError("gone.npz"))
        th.join(timeout=5)
        assert len(errs) == 1
        assert isinstance(errs[0].__cause__, FileNotFoundError)


class TestPipelinedUpload:
    """The pipelined fill->upload must be bit-identical to uploading after
    the fill completes, and a fill failure must kill the run promptly."""

    def test_chunked_put_with_wait_rows_matches_direct(self):
        """Stream slabs behind a concurrent fill (tiny chunk_bytes forces
        many slabs) — the device buffer must equal a direct put of the
        finished matrix."""
        import threading

        from mermaid_classifier_tpu.train.trainer import _FilledPrefix

        rng = np.random.default_rng(0)
        X = rng.standard_normal((64, 32)).astype(np.float32)
        staged = np.zeros_like(X)
        tracker = _FilledPrefix(64)

        def fill():
            order = [3, 0, 1, 2, 5, 4, 7, 6]  # out-of-order 8-row spans
            for k in order:
                staged[k * 8: (k + 1) * 8] = X[k * 8: (k + 1) * 8]
                tracker.add(k * 8, 8)

        th = threading.Thread(target=fill, daemon=True)
        th.start()
        got = MLPClassifier._chunked_device_put(
            staged, chunk_bytes=8 * 32 * 4, wait_rows=tracker.wait
        )
        th.join(timeout=5)
        np.testing.assert_array_equal(np.asarray(got), X)

    def test_resident_fill_failure_propagates_without_hang(self, task_labels):
        """Delete one feature file: the trainer must raise the fill error
        (and the concurrent uploader must shut down, not deadlock)."""
        import os

        victim = sorted(task_labels.train.data.keys())[2]
        os.remove(victim)
        trainer = SmallNetTrainer(batch_size=64, device_resident=True)
        with pytest.raises(FileNotFoundError):
            trainer(task_labels, nbr_epochs=2, pc_models=[])

    def test_wait_rows_guards_converting_inputs(self):
        """A non-f32 input (f64 buffer, f64 scale vector) makes the
        upload snapshot a CONVERTED copy — with wait_rows it must wait
        for the full fill BEFORE converting, or the device receives the
        buffer's initial garbage."""
        import threading

        from mermaid_classifier_tpu.train.trainer import _FilledPrefix

        rng = np.random.default_rng(1)
        final = rng.standard_normal((16, 8)).astype(np.float64)

        # f32 path with an f64 staging buffer.
        staged = np.zeros((16, 8), np.float64)
        tracker = _FilledPrefix(16)

        def fill():
            staged[:] = final
            tracker.add(0, 16)

        th = threading.Thread(target=fill, daemon=True)
        clf = MLPClassifier((4,), random_state=0)
        th.start()
        clf.set_resident_features(staged, wait_rows=tracker.wait)
        th.join(timeout=5)
        np.testing.assert_array_equal(
            np.asarray(clf._resident_X), final.astype(np.float32)
        )

        # Storage path with an f64 scale vector (copied by asarray).
        q = rng.integers(-127, 127, (16, 8)).astype(np.int8)
        scale64 = np.zeros(16, np.float64)
        tracker2 = _FilledPrefix(16)

        def fill2():
            scale64[:] = np.arange(1, 17)
            tracker2.add(0, 16)

        th2 = threading.Thread(target=fill2, daemon=True)
        clf2 = MLPClassifier((4,), random_state=0)
        th2.start()
        clf2.set_resident_features_storage(
            q, scale64, wait_rows=tracker2.wait
        )
        th2.join(timeout=5)
        np.testing.assert_array_equal(
            np.asarray(clf2._resident_scale),
            np.arange(1, 17, dtype=np.float32),
        )

    def test_upload_failure_surfaces_not_swallowed(self, task_labels,
                                                   monkeypatch):
        """An uploader that dies (device OOM, wedged transfer) must
        surface its error from the trainer call — and the bidirectional
        abort means the fill never completes obliviously."""
        boom = MemoryError("HBM exhausted")

        def raising(*a, **k):
            raise boom

        monkeypatch.setattr(MLPClassifier, "set_resident_features", raising)
        trainer = SmallNetTrainer(batch_size=64, device_resident=True)
        with pytest.raises(BaseException) as excinfo:
            trainer(task_labels, nbr_epochs=2, pc_models=[])
        exc = excinfo.value
        assert boom is exc or boom is getattr(exc, "__cause__", None)
