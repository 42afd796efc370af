"""Differential tests: our Platt sigmoid calibration vs sklearn's
(reference analog: tests/pyspacer/test_trainer.py:104-118 pins batched
calibration ≡ CalibratedClassifierCV.fit)."""

import numpy as np
import pytest

from mermaid_classifier_tpu.train.calibration import (
    CalibratedClassifier,
    fit_sigmoid_calibration,
)


from sklearn.base import BaseEstimator, ClassifierMixin


class _FrozenProbaEstimator(ClassifierMixin, BaseEstimator):
    """Minimal prefit estimator: stores a lookup from row index to proba.

    sklearn's calibrated-classifier internals only call predict_proba, so a
    deterministic fake estimator lets us compare calibration math end-to-end
    without training anything.
    """

    def __init__(self, proba, classes):
        self._proba = np.asarray(proba, dtype=np.float64)
        self.classes_ = np.asarray(classes)

    def fit(self, X, y):
        return self

    def predict_proba(self, X):
        idx = np.asarray(X[:, 0], dtype=int)
        return self._proba[idx]


def _random_proba(rng, n, k):
    raw = rng.random((n, k))
    return raw / raw.sum(axis=1, keepdims=True)


class TestSigmoidFit:
    def test_matches_sklearn_sigmoid_calibration(self):
        from sklearn.calibration import _SigmoidCalibration

        rng = np.random.default_rng(0)
        scores = rng.random(500)
        y = (scores + rng.normal(0, 0.3, 500) > 0.5).astype(int)

        a, b = fit_sigmoid_calibration(scores, y)
        sk = _SigmoidCalibration().fit(scores, y)
        assert a == pytest.approx(sk.a_, rel=1e-5, abs=1e-7)
        assert b == pytest.approx(sk.b_, rel=1e-5, abs=1e-7)

    def test_matches_sklearn_with_large_scores(self):
        # Exercises the max|F| >= 30 rescale path.
        from sklearn.calibration import _SigmoidCalibration

        rng = np.random.default_rng(1)
        scores = rng.normal(0, 50, 400)
        y = (scores > 0).astype(int)
        a, b = fit_sigmoid_calibration(scores, y)
        sk = _SigmoidCalibration().fit(scores, y)
        assert a == pytest.approx(sk.a_, rel=1e-4, abs=1e-8)
        assert b == pytest.approx(sk.b_, rel=1e-4, abs=1e-6)

    def test_sample_weight(self):
        from sklearn.calibration import _SigmoidCalibration

        rng = np.random.default_rng(2)
        scores = rng.random(300)
        y = (scores > 0.4).astype(int)
        w = rng.random(300) + 0.1
        a, b = fit_sigmoid_calibration(scores, y, sample_weight=w)
        sk = _SigmoidCalibration().fit(scores, y, sample_weight=w)
        assert a == pytest.approx(sk.a_, rel=1e-4, abs=1e-6)
        assert b == pytest.approx(sk.b_, rel=1e-4, abs=1e-6)


class TestCalibratedClassifier:
    def test_multiclass_matches_sklearn_prefit(self):
        # sklearn >= 1.6 removed cv='prefit'; the equivalent internal object
        # (which CalibratedClassifierCV delegates to, and which the reference
        # assembled by hand in trainer.py:384-396) is _CalibratedClassifier
        # over per-class _SigmoidCalibration fits.
        from sklearn.calibration import _CalibratedClassifier, _SigmoidCalibration

        rng = np.random.default_rng(3)
        n, k = 400, 5
        classes = np.array([f"c{i}" for i in range(k)])
        proba = _random_proba(rng, n, k)
        # Labels correlated with proba so calibration is meaningful.
        y = classes[
            np.array(
                [rng.choice(k, p=row) for row in proba]
            )
        ]
        X = np.arange(n, dtype=np.float64)[:, None]
        est = _FrozenProbaEstimator(proba, classes)

        ours = CalibratedClassifier.fit_from_scores(est, proba, y)
        sk_cals = [
            _SigmoidCalibration().fit(proba[:, i], (y == classes[i]).astype(int))
            for i in range(k)
        ]
        theirs = _CalibratedClassifier(est, sk_cals, classes=classes, method="sigmoid")

        got = ours.predict_proba(X)
        expected = theirs.predict_proba(X)
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-8)

        # Per-class sigmoid params match sklearn's calibrators
        # (the reference's batched-calibration equivalence check,
        # trainer tests pin exactly this).
        np.testing.assert_allclose(
            ours.calibration_a_, [c.a_ for c in sk_cals], rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            ours.calibration_b_, [c.b_ for c in sk_cals], rtol=1e-5, atol=1e-7
        )

    def test_binary_matches_sklearn_prefit(self):
        from sklearn.calibration import _CalibratedClassifier, _SigmoidCalibration

        rng = np.random.default_rng(4)
        n = 300
        classes = np.array(["neg", "pos"])
        proba = _random_proba(rng, n, 2)
        y = np.where(proba[:, 1] + rng.normal(0, 0.2, n) > 0.5, "pos", "neg")
        X = np.arange(n, dtype=np.float64)[:, None]
        est = _FrozenProbaEstimator(proba, classes)

        ours = CalibratedClassifier.fit_from_scores(est, proba[:, 1:], y)
        # Binary: sklearn fits a single calibrator on the positive-class
        # column (reference: trainer.py:366-374).
        sk_cal = _SigmoidCalibration().fit(proba[:, 1], (y == "pos").astype(int))
        theirs = _CalibratedClassifier(est, [sk_cal], classes=classes, method="sigmoid")
        np.testing.assert_allclose(
            ours.predict_proba(X), theirs.predict_proba(X), rtol=1e-6, atol=1e-8
        )

    def test_calibrate_scores_streaming_equivalence(self):
        # calibrate_scores on precomputed batches == predict_proba in one go
        # (the trainer's O(N*K) streaming-memory trick).
        rng = np.random.default_rng(5)
        n, k = 120, 4
        classes = np.array([f"c{i}" for i in range(k)])
        proba = _random_proba(rng, n, k)
        y = classes[rng.integers(0, k, n)]
        X = np.arange(n, dtype=np.float64)[:, None]
        est = _FrozenProbaEstimator(proba, classes)
        cal = CalibratedClassifier.fit_from_scores(est, proba, y)

        whole = cal.predict_proba(X)
        parts = np.vstack(
            [cal.calibrate_scores(proba[i : i + 32]) for i in range(0, n, 32)]
        )
        np.testing.assert_array_equal(whole, parts)

    def test_shape_validation(self):
        rng = np.random.default_rng(6)
        classes = np.array(["a", "b", "c"])
        proba = _random_proba(rng, 50, 3)
        est = _FrozenProbaEstimator(proba, classes)
        with pytest.raises(ValueError, match="columns"):
            CalibratedClassifier.fit_from_scores(
                est, proba[:, :2], classes[rng.integers(0, 3, 50)]
            )


class TestDeviceBatchBackend:
    """The batched device Newton fitter must land on the scipy answers —
    same objective, same targets, same rescale trick — across multiclass,
    binary, weighted, degenerate-column, and large-score shapes (house
    differential style: the device path is pinned against the proven
    reference path, which itself is pinned against sklearn)."""

    def _compare(self, est, proba, y, sample_weight=None, atol=2e-4):
        cpu = CalibratedClassifier.fit_from_scores(
            est, proba, y, sample_weight=sample_weight
        )
        dev = CalibratedClassifier.fit_from_scores(
            est, proba, y, sample_weight=sample_weight, backend="device"
        )
        np.testing.assert_allclose(
            dev.calibration_a_, cpu.calibration_a_, rtol=2e-3, atol=atol
        )
        np.testing.assert_allclose(
            dev.calibration_b_, cpu.calibration_b_, rtol=2e-3, atol=atol
        )
        # What matters downstream: calibrated probabilities agree.
        np.testing.assert_allclose(
            dev.calibrate_scores(np.asarray(proba, np.float64)),
            cpu.calibrate_scores(np.asarray(proba, np.float64)),
            atol=5e-5,
        )

    def test_multiclass_matches_scipy(self):
        rng = np.random.default_rng(10)
        n, k = 4000, 12
        classes = np.array([f"c{i}" for i in range(k)])
        proba = _random_proba(rng, n, k)
        # Correlate labels with scores so the fits are non-trivial.
        y = classes[np.argmax(proba + rng.normal(0, 0.2, (n, k)), axis=1)]
        est = _FrozenProbaEstimator(proba, classes)
        self._compare(est, proba, y)

    def test_binary_matches_scipy(self):
        rng = np.random.default_rng(11)
        n = 1500
        classes = np.array(["neg", "pos"])
        proba = _random_proba(rng, n, 2)
        y = classes[(proba[:, 1] + rng.normal(0, 0.3, n) > 0.5).astype(int)]
        est = _FrozenProbaEstimator(proba, classes)
        cpu = CalibratedClassifier.fit_from_scores(est, proba[:, 1:], y)
        dev = CalibratedClassifier.fit_from_scores(
            est, proba[:, 1:], y, backend="device"
        )
        np.testing.assert_allclose(
            dev.calibration_a_, cpu.calibration_a_, rtol=2e-3, atol=2e-4
        )
        np.testing.assert_allclose(
            dev.calibration_b_, cpu.calibration_b_, rtol=2e-3, atol=2e-4
        )

    def test_sample_weight_matches_scipy(self):
        rng = np.random.default_rng(12)
        n, k = 1200, 5
        classes = np.array([f"c{i}" for i in range(k)])
        proba = _random_proba(rng, n, k)
        y = classes[np.argmax(proba + rng.normal(0, 0.2, (n, k)), axis=1)]
        w = rng.random(n) + 0.1
        est = _FrozenProbaEstimator(proba, classes)
        self._compare(est, proba, y, sample_weight=w)

    def test_large_scores_rescale_branch(self):
        """max|F| >= 30 per-class rescale, exercised through the batch
        fitter directly (fit_from_scores feeds probabilities, which never
        trip it)."""
        from mermaid_classifier_tpu.train.calibration import (
            fit_sigmoid_calibration_batch,
        )

        rng = np.random.default_rng(13)
        n = 900
        scores = np.column_stack(
            [rng.normal(0, 50, n), rng.normal(0, 0.5, n)]
        )
        targets = np.column_stack(
            [(scores[:, 0] > 0), (scores[:, 1] > 0.2)]
        ).astype(float)
        a_dev, b_dev = fit_sigmoid_calibration_batch(scores, targets)
        for col in range(2):
            a_cpu, b_cpu = fit_sigmoid_calibration(
                scores[:, col], targets[:, col]
            )
            assert a_dev[col] == pytest.approx(a_cpu, rel=2e-3, abs=2e-4)
            assert b_dev[col] == pytest.approx(b_cpu, rel=2e-3, abs=2e-3)

    def test_degenerate_column_is_finite(self):
        """A class with constant scores (and one with no positives) must
        produce finite parameters, not NaNs from a singular Hessian."""
        from mermaid_classifier_tpu.train.calibration import (
            fit_sigmoid_calibration_batch,
        )

        n = 400
        rng = np.random.default_rng(14)
        scores = np.column_stack(
            [np.full(n, 0.25), rng.random(n)]
        )
        targets = np.column_stack(
            [rng.integers(0, 2, n), np.zeros(n)]
        ).astype(float)
        a, b = fit_sigmoid_calibration_batch(scores, targets)
        assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))

    def test_unknown_backend_rejected(self):
        rng = np.random.default_rng(15)
        classes = np.array(["a", "b", "c"])
        proba = _random_proba(rng, 30, 3)
        est = _FrozenProbaEstimator(proba, classes)
        with pytest.raises(ValueError, match="backend"):
            CalibratedClassifier.fit_from_scores(
                est, proba, classes[rng.integers(0, 3, 30)], backend="torch"
            )
