"""The factory-hook battery: one suite executed against BOTH sklearn's
MLPClassifier and this framework's MLPClassifier, plus a production-arch
(500,300,100) head-to-head and a synthetic run of the full production
recipe pinned as a regression anchor
(reference analog: tests/pyspacer/test_mlp_benchmark.py:95-407)."""

from __future__ import annotations

import pickle

import numpy as np
import pytest
from sklearn.neural_network import MLPClassifier as SklearnMLP

from mermaid_classifier_tpu.train.mlp_classifier import MLPClassifier

SEED = 42
N_CLASSES = 5
N_FEATURES = 32
N_TRAIN = 500
N_VAL = 200
HIDDEN = (64,)
LR = 1e-2
EPOCHS = 20
CHUNK = 100  # samples per partial_fit call (trainer-style chunks)


def make_gaussian_clusters(n_per_class, n_features=N_FEATURES, seed=SEED,
                           n_classes=N_CLASSES, cluster_std=1.3):
    rng = np.random.RandomState(seed)
    centroids = rng.randn(n_classes, n_features) * 3.0
    X_parts, y_parts = [], []
    for k in range(n_classes):
        X_parts.append(centroids[k] + rng.randn(n_per_class, n_features) * cluster_std)
        y_parts.append(np.full(n_per_class, f"class_{k}", dtype=object))
    X = np.concatenate(X_parts).astype(np.float32)
    y = np.concatenate(y_parts)
    order = rng.permutation(len(X))
    return X[order], y[order]


def train_epochs(clf, X, y, classes, epochs=EPOCHS, chunk=CHUNK, seed=SEED + 1):
    """The MermaidTrainer interaction pattern: shuffled epochs of
    partial_fit chunks — the exact surface the real trainer drives."""
    rng = np.random.RandomState(seed)
    for _ in range(epochs):
        order = rng.permutation(len(X))
        Xs, ys = X[order], y[order]
        for start in range(0, len(X), chunk):
            clf.partial_fit(Xs[start:start + chunk], ys[start:start + chunk],
                            classes=classes)


@pytest.fixture(scope="module")
def clusters():
    X, y = make_gaussian_clusters(n_per_class=(N_TRAIN + N_VAL) // N_CLASSES)
    classes = sorted(np.unique(y).tolist())
    return {
        "X_train": X[N_VAL:], "y_train": y[N_VAL:],
        "X_val": X[:N_VAL], "y_val": y[:N_VAL],
        "classes": classes,
    }


class MLPBatteryBase:
    """Every test here runs twice — once per implementation — via the
    ``make_classifier`` hook. Accuracy floors are loose sanity bounds
    ("can it learn at all"); the head-to-head parity lives below."""

    def make_classifier(self):
        raise NotImplementedError

    @pytest.fixture()
    def trained(self, clusters):
        clf = self.make_classifier()
        train_epochs(clf, clusters["X_train"], clusters["y_train"],
                     clusters["classes"])
        return clf

    def test_converges_on_training_set(self, trained, clusters):
        acc = float(np.mean(trained.predict(clusters["X_train"])
                            == clusters["y_train"]))
        assert acc > 0.85

    def test_generalises_to_validation(self, trained, clusters):
        acc = float(np.mean(trained.predict(clusters["X_val"])
                            == clusters["y_val"]))
        assert acc > 0.80

    def test_proba_shape_and_normalisation(self, trained, clusters):
        probs = trained.predict_proba(clusters["X_val"])
        assert probs.shape == (N_VAL, N_CLASSES)
        np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5, atol=1e-5)
        assert (probs >= 0).all() and (probs <= 1).all()

    def test_classes_attribute_sorted(self, trained, clusters):
        got = [str(c) for c in trained.classes_]
        assert got == sorted(got) == clusters["classes"]

    def test_loss_curve_finite_and_decreasing(self, trained):
        curve = trained.loss_curve_
        assert len(curve) > 0 and all(np.isfinite(curve))
        assert curve[-1] < curve[0]

    def test_predict_agrees_with_proba_argmax(self, trained, clusters):
        probs = trained.predict_proba(clusters["X_val"])
        argmax_labels = np.asarray(trained.classes_)[np.argmax(probs, axis=1)]
        np.testing.assert_array_equal(trained.predict(clusters["X_val"]),
                                      argmax_labels)

    def test_pickle_roundtrip_preserves_predictions(self, trained, clusters):
        clone = pickle.loads(pickle.dumps(trained))
        np.testing.assert_array_equal(
            trained.predict(clusters["X_val"]), clone.predict(clusters["X_val"])
        )
        np.testing.assert_allclose(
            trained.predict_proba(clusters["X_val"]),
            clone.predict_proba(clusters["X_val"]),
            rtol=1e-5, atol=1e-6,
        )

    def test_tiny_chunk_partial_fit_accumulates(self, clusters):
        clf = self.make_classifier()
        train_epochs(clf, clusters["X_train"], clusters["y_train"],
                     clusters["classes"], chunk=50, seed=SEED + 2)
        acc = float(np.mean(clf.predict(clusters["X_val"]) == clusters["y_val"]))
        assert acc > 0.75

    def test_usable_for_prefit_calibration(self, trained, clusters):
        probs = trained.predict_proba(clusters["X_val"][:10])
        assert probs.shape == (10, N_CLASSES)


class TestSklearnBattery(MLPBatteryBase):
    """Baseline: the battery against sklearn itself proves the suite's
    expectations are implementation-independent."""

    def make_classifier(self):
        return SklearnMLP(hidden_layer_sizes=HIDDEN, learning_rate_init=LR,
                          random_state=SEED)


class TestOursBattery(MLPBatteryBase):
    def make_classifier(self):
        return MLPClassifier(hidden_layer_sizes=HIDDEN, learning_rate_init=LR,
                             random_state=SEED)


class TestProductionArchParity:
    """Full training run on the PRODUCTION architecture (500, 300, 100) @
    lr 1e-4 — both implementations, identical data and epoch/shuffle
    streams — accuracy and probability parity within tolerance."""

    @pytest.fixture(scope="class")
    def trained_pair(self):
        X, y = make_gaussian_clusters(n_per_class=120, n_features=64,
                                      seed=SEED)
        classes = sorted(np.unique(y).tolist())
        X_train, y_train = X[150:], y[150:]
        X_val, y_val = X[:150], y[:150]
        sk = SklearnMLP(hidden_layer_sizes=(500, 300, 100),
                        learning_rate_init=1e-4, random_state=SEED)
        ours = MLPClassifier(hidden_layer_sizes=(500, 300, 100),
                             learning_rate_init=1e-4, random_state=SEED)
        for clf in (sk, ours):
            train_epochs(clf, X_train, y_train, classes, epochs=12, chunk=128)
        return sk, ours, X_train, y_train, X_val, y_val

    def test_val_accuracy_within_tolerance(self, trained_pair):
        sk, ours, _, _, X_val, y_val = trained_pair
        sk_acc = float(np.mean(sk.predict(X_val) == y_val))
        our_acc = float(np.mean(ours.predict(X_val) == y_val))
        assert our_acc >= sk_acc - 0.05, f"ours {our_acc:.3f} vs sklearn {sk_acc:.3f}"

    def test_train_accuracy_within_tolerance(self, trained_pair):
        sk, ours, X_train, y_train, _, _ = trained_pair
        sk_acc = float(np.mean(sk.predict(X_train) == y_train))
        our_acc = float(np.mean(ours.predict(X_train) == y_train))
        assert our_acc >= sk_acc - 0.05

    def test_argmax_agreement(self, trained_pair):
        sk, ours, _, _, X_val, _ = trained_pair
        sk_argmax = np.argmax(sk.predict_proba(X_val), axis=1)
        our_argmax = np.argmax(ours.predict_proba(X_val), axis=1)
        assert float(np.mean(sk_argmax == our_argmax)) > 0.85

    def test_proba_values_close(self, trained_pair):
        sk, ours, _, _, X_val, _ = trained_pair
        mad = float(np.mean(np.abs(sk.predict_proba(X_val)
                                   - ours.predict_proba(X_val))))
        assert mad < 1e-2, f"mean abs proba diff {mad:.4f}"

    def test_calibrated_proba_close(self, trained_pair):
        """Calibrate both prefit heads on the same held-out half and
        compare calibrated probabilities — sklearn's CalibratedClassifierCV
        for sklearn, this framework's calibrator for ours."""
        from sklearn.calibration import CalibratedClassifierCV
        from sklearn.frozen import FrozenEstimator

        from mermaid_classifier_tpu.train.calibration import (
            CalibratedClassifier,
        )

        sk, ours, _, _, X_val, y_val = trained_pair
        n_cal = len(X_val) // 2
        sk_cal = CalibratedClassifierCV(FrozenEstimator(sk)).fit(
            X_val[:n_cal], y_val[:n_cal]
        )
        our_cal = CalibratedClassifier.fit_from_scores(
            ours, ours.predict_proba(X_val[:n_cal]), y_val[:n_cal]
        )
        mad = float(np.mean(np.abs(
            sk_cal.predict_proba(X_val[n_cal:])
            - our_cal.predict_proba(X_val[n_cal:])
        )))
        assert mad < 1e-2, f"calibrated mean abs proba diff {mad:.4f}"


class TestProductionRecipeAnchor:
    """The production recipe — balanced per-class targets, effective-number
    class weights with the 5000 ratio cap, production arch, epoch budget
    with patience 3 — on synthetic data, end metrics pinned as a
    regression anchor (reference recipe: docs/research/
    balancing-experiments.md C2; SURVEY.md §6)."""

    def test_recipe_end_metrics(self, tmp_path):
        from mermaid_classifier_tpu.data.labels import preprocess_labels
        from mermaid_classifier_tpu.data.subsample import (
            SubsampleOptions,
            compute_per_class_targets,
        )
        from mermaid_classifier_tpu.train.class_weights import (
            SampleWeightingOptions,
            compute_class_weights,
        )
        from mermaid_classifier_tpu.train.trainer import MermaidTrainer

        from tests.data.test_labels import build_synthetic_labels

        labels, class_names = build_synthetic_labels(
            tmp_path, n_images=40, pts_per_image=12, n_classes=4, dim=8,
            seed=SEED,
        )
        task_labels = preprocess_labels(labels, split_ratios=(0.15, 0.15))

        # Balanced subsample allocator on the train counts (the SQL apply
        # is dataset-side; the allocator is the recipe's policy knob).
        counts = {c: 0 for c in class_names}
        for anns in task_labels.train.data.values():
            for _, _, label in anns:
                counts[label] += 1
        targets = compute_per_class_targets(
            SubsampleOptions(strategy="balanced", total_annotations=100000,
                             min_per_class=10),
            counts,
        )
        assert set(targets) == set(class_names)
        assert all(t >= 10 for t in targets.values())

        weights = compute_class_weights(
            counts,
            SampleWeightingOptions(enabled=True, weight_ratio_cap=5000.0),
        )
        ratio = max(weights.values()) / min(weights.values())
        assert ratio <= 5000.0

        trainer = MermaidTrainer(
            batch_size=256,
            class_weight=weights,
            early_stopping_patience=3,
        )
        clf_cal, val_results, msg = trainer(task_labels, nbr_epochs=40,
                                            pc_models=[])

        info = trainer._early_stop_info
        # -- the anchor: these values regress only if the recipe's numerics
        # change (seeds fixed end to end). Tolerances absorb BLAS drift.
        assert msg.acc == pytest.approx(1.0, abs=0.05)
        assert info["enabled"]
        assert info["stop_reason"] in ("early_stopping", "budget_exhausted")
        assert info["best_val_epoch"] is not None
        assert info["best_val_loss"] == pytest.approx(0.0, abs=0.15)
        assert len(msg.ref_accs) == info["final_epoch"]
        assert msg.ref_accs[-1] == pytest.approx(1.0, abs=0.05)
        proba = clf_cal.predict_proba(
            np.vstack([x for x, _ in
                       task_labels.val.load_data_in_batches(batch_size=512)])
        )
        np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-6)


class FitConvergenceSemanticsTest:
    """Pin fit()'s early-stop contract to sklearn's
    ``n_iter_no_change`` rule (MLPClassifier._fit_stochastic /
    _update_no_improvement_count): stop only after the loss fails to
    improve on ``best_loss_`` by more than ``tol`` for
    ``n_iter_no_change`` CONSECUTIVE epochs. This is a deliberate,
    documented divergence from the reference's analog, which breaks after
    a single epoch with |prev-cur| < tol
    (reference: torch_classifier.py:319-330)."""

    @staticmethod
    def scripted(losses, **kwargs):
        """Run fit() with partial_fit replaced by a loss script."""
        script = iter(losses)

        class Scripted(MLPClassifier):
            def partial_fit(self, X, y, classes=None):
                if not hasattr(self, "loss_curve_"):
                    self.loss_curve_ = []
                    self.n_iter_ = 0
                self.loss_curve_.append(next(script))
                self.n_iter_ += 1
                return self

        clf = Scripted((4,), max_iter=len(losses), **kwargs)
        clf.fit(np.zeros((4, 2), np.float32), np.array(["a", "a", "b", "b"]))
        return clf


class TestFitConvergenceSemantics(FitConvergenceSemanticsTest):
    def test_sub_tol_plateau_runs_n_iter_no_change_epochs(self):
        # Improvements of 5e-5 < tol=1e-4 every epoch: the old |prev-cur|
        # rule stops at epoch 2; sklearn's rule increments the
        # no-improvement counter from epoch 2 on and stops when it EXCEEDS
        # n_iter_no_change=10 -> epoch 12.
        losses = [1.0 - 5e-5 * i for i in range(100)]
        clf = self.scripted(losses, tol=1e-4, n_iter_no_change=10)
        assert clf.n_iter_ == 12

    def test_improvement_resets_the_counter(self):
        # Two sub-tol epochs, one big improvement, then a sub-tol plateau:
        # the counter resets at the improvement, so the stop lands
        # n_iter_no_change+1 epochs after it.
        losses = [1.0, 0.99996, 0.99993, 0.5] + [0.5 - 1e-6 * i
                                                 for i in range(1, 50)]
        clf = self.scripted(losses, tol=1e-4, n_iter_no_change=10)
        assert clf.n_iter_ == 4 + 11

    def test_best_loss_tracks_minimum_not_last(self):
        # A loss that worsens then recovers above best-tol keeps counting:
        # best_loss_ is the running MINIMUM (sklearn), not the last value.
        losses = [1.0, 2.0, 1.5, 1.2, 1.1, 1.05, 1.01, 1.005, 1.001,
                  1.0005, 1.0001, 1.00005, 3.0]
        clf = self.scripted(losses, tol=1e-4, n_iter_no_change=10)
        # epoch 1 sets best=1.0; every later epoch is > best - tol.
        assert clf.n_iter_ == 12
        assert clf.best_loss_ == 1.0

    def test_steady_improvement_runs_to_max_iter(self):
        losses = [float(100 - i) for i in range(30)]
        clf = self.scripted(losses, tol=1e-4, n_iter_no_change=10)
        assert clf.n_iter_ == 30

    def test_real_fit_does_not_stop_after_one_plateau_epoch(self, clusters):
        # End-to-end: on a learnable problem with a small max_iter budget,
        # fit() must not bail on the first |prev-cur| < tol epoch (the old
        # rule). A generous tol makes single-epoch deltas sub-tol almost
        # immediately, yet the sklearn rule still runs 1 + n_iter_no_change
        # + 1 epochs minimum before stopping.
        clf = MLPClassifier(HIDDEN, learning_rate_init=LR, random_state=0,
                            tol=10.0, n_iter_no_change=3, max_iter=30)
        clf.fit(clusters["X_train"], clusters["y_train"])
        assert clf.n_iter_ == 5  # epoch 1 + 3 non-improving + the trigger
        assert clf.best_loss_ == min(clf.loss_curve_)


class TestIdenticalInitTracksSklearn:
    """The strongest sklearn-parity claim: given IDENTICAL initial
    weights, N epochs of partial_fit through the same data stream produce
    the same trained model as sklearn — loss curves track and final
    predictions agree. This pins the whole update path (forward, CE loss,
    per-batch L2 scaling, Adam step, loss-curve averaging) in composition,
    so any quality delta in the end-to-end benchmark
    (tests/train/test_quality_parity.py) is attributable to the documented
    init difference, not to update math."""

    def test_loss_curves_and_predictions_match(self, clusters):
        X_tr = clusters["X_train"]
        y_tr = clusters["y_train"]
        classes = clusters["classes"]

        # sklearn's freshly-initialized weights: a near-zero-lr bootstrap
        # step leaves them effectively at init.
        probe = SklearnMLP(hidden_layer_sizes=HIDDEN,
                           learning_rate_init=1e-30, batch_size=8,
                           random_state=0, max_iter=1, shuffle=False)
        probe.partial_fit(X_tr[:8], y_tr[:8], classes=classes)
        W0 = [w.copy() for w in probe.coefs_]
        B0 = [b.copy() for b in probe.intercepts_]

        import jax.numpy as jnp

        ours = MLPClassifier(HIDDEN, learning_rate_init=LR,
                             batch_size=100, random_state=0, shuffle=False)
        skl = SklearnMLP(hidden_layer_sizes=HIDDEN, learning_rate_init=LR,
                         batch_size=100, random_state=0, max_iter=EPOCHS,
                         shuffle=False)
        # Materialize params with a bootstrap call, then overwrite BOTH
        # sides with the identical W0/B0 and zeroed Adam state.
        ours.partial_fit(X_tr[:8], y_tr[:8], classes=classes)
        ours._params = {"W": [jnp.asarray(w) for w in W0],
                        "b": [jnp.asarray(b) for b in B0]}
        ours._init_optimizer()
        ours.loss_curve_ = []
        skl.partial_fit(X_tr[:8], y_tr[:8], classes=classes)
        for i in range(len(W0)):
            skl.coefs_[i][:] = W0[i]
            skl.intercepts_[i][:] = B0[i]
        skl._optimizer.ms = [np.zeros_like(m) for m in skl._optimizer.ms]
        skl._optimizer.vs = [np.zeros_like(v) for v in skl._optimizer.vs]
        skl._optimizer.t = 0
        skl.loss_curve_ = []

        for clf in (ours, skl):
            train_epochs(clf, X_tr, y_tr, classes, epochs=6)

        ours_curve = np.asarray(ours.loss_curve_, dtype=np.float64)
        skl_curve = np.asarray(skl.loss_curve_, dtype=np.float64)
        assert ours_curve.shape == skl_curve.shape
        # Float32 forward + different BLAS accumulation orders drift the
        # curves slightly; semantically-equal updates keep them tracking
        # within a fraction of a percent throughout.
        np.testing.assert_allclose(ours_curve, skl_curve, rtol=0.02)
        np.testing.assert_allclose(ours_curve[-3:], skl_curve[-3:],
                                   rtol=0.005)

        X_val = clusters["X_val"]
        agree = np.mean(ours.predict(X_val) == skl.predict(X_val))
        assert agree >= 0.99
        np.testing.assert_allclose(
            ours.predict_proba(X_val), skl.predict_proba(X_val), atol=0.02
        )


class TestSklearnInitTracksFromSeedAlone:
    """init='sklearn' replicates sklearn's exact init stream (same
    RandomState draws, same order, uniform intercepts), so with the same
    seed and shuffle=False the trained model tracks sklearn's from the
    SEED alone — no weight copying. The strongest possible drop-in
    compatibility claim, complementing TestIdenticalInitTracksSklearn
    (which proves the update path with injected weights)."""

    def test_same_seed_same_model(self, clusters):
        X_tr = clusters["X_train"]
        y_tr = clusters["y_train"]
        classes = clusters["classes"]
        ours = MLPClassifier(HIDDEN, learning_rate_init=LR, batch_size=100,
                             random_state=7, shuffle=False, init="sklearn")
        skl = SklearnMLP(hidden_layer_sizes=HIDDEN, learning_rate_init=LR,
                         batch_size=100, random_state=7, shuffle=False,
                         max_iter=6)
        for clf in (ours, skl):
            train_epochs(clf, X_tr, y_tr, classes, epochs=6)
        X_val = clusters["X_val"]
        po = ours.predict_proba(X_val)
        ps = skl.predict_proba(X_val)
        np.testing.assert_allclose(po, ps, atol=5e-4)
        assert float(np.mean(po.argmax(1) == ps.argmax(1))) == 1.0
        np.testing.assert_allclose(
            np.asarray(ours.loss_curve_, np.float64),
            np.asarray(skl.loss_curve_, np.float64),
            rtol=1e-3,
        )

    def test_invalid_init_rejected(self):
        with pytest.raises(ValueError):
            MLPClassifier((8,), init="zeros")

    def test_reference_init_is_default_with_zero_biases(self):
        clf = MLPClassifier((8,), random_state=0)
        clf.partial_fit(np.zeros((4, 3), np.float32),
                        np.array(["a", "a", "b", "b"]),
                        classes=["a", "b"])
        assert clf.init == "reference"
        assert all(float(np.abs(b).max()) == 0.0 for b in clf._params["b"])
