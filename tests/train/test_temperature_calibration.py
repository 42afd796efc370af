"""Temperature calibration: NLL improvement, argmax preservation, known-
temperature recovery, and the streaming/binary contracts.

The beyond-parity calibration family (train/calibration.py
TemperatureCalibratedClassifier): p^(1/T) renormalized == softmax of
temperature-scaled logits. Differential style follows the sigmoid suite
(test_calibration.py): synthetic data, seconds-fast, the existing sigmoid
path is the comparison baseline.
"""

import numpy as np
import pytest
import sklearn.metrics

from mermaid_classifier_tpu.train.calibration import (
    CalibratedClassifier,
    TemperatureCalibratedClassifier,
    fit_temperature,
)

from tests.train.test_calibration import _FrozenProbaEstimator


def _softmax(z):
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def _overconfident_problem(n=4000, k=6, sharpen=3.0, seed=0):
    """Labels drawn from p; the model reports p^sharpen renormalized —
    an overconfident model whose NLL a temperature > 1 must improve."""
    rng = np.random.default_rng(seed)
    logits = rng.normal(0, 1.5, size=(n, k))
    p_true = _softmax(logits)
    y_idx = np.array([rng.choice(k, p=row) for row in p_true])
    reported = _softmax(sharpen * logits)
    classes = np.array([f"label_{i}" for i in range(k)])
    est = _FrozenProbaEstimator(reported, classes)
    X = np.arange(n, dtype=np.float64)[:, None]
    return est, X, reported, classes[y_idx], y_idx, sharpen


class TestTemperatureFit:
    def test_nll_improves_on_fit_split_and_beats_sigmoid(self):
        est, X, reported, y, y_idx, _ = _overconfident_problem()
        cal = TemperatureCalibratedClassifier.fit_from_scores(est, reported, y)
        nll_uncal = sklearn.metrics.log_loss(y_idx, reported)
        nll_temp = sklearn.metrics.log_loss(y_idx, cal.predict_proba(X))
        sig = CalibratedClassifier.fit_from_scores(est, reported, y)
        nll_sig = sklearn.metrics.log_loss(y_idx, sig.predict_proba(X))
        # The 1-D NLL fit can only improve on beta=1 (== uncalibrated) on
        # the split it was fit on; on this overconfident model it must
        # also beat the Platt recipe (which is not NLL-optimal here).
        assert nll_temp < nll_uncal
        assert nll_temp < nll_sig

    def test_recovers_known_temperature(self):
        # reported = softmax(sharpen * logits) with labels from
        # softmax(logits): the NLL-optimal temperature is ~sharpen.
        est, X, reported, y, _, sharpen = _overconfident_problem(
            n=20000, sharpen=2.5, seed=1
        )
        cal = TemperatureCalibratedClassifier.fit_from_scores(est, reported, y)
        assert cal.temperature_ == pytest.approx(sharpen, rel=0.15)

    def test_argmax_preserved(self):
        est, X, reported, y, _, _ = _overconfident_problem(seed=2)
        cal = TemperatureCalibratedClassifier.fit_from_scores(est, reported, y)
        np.testing.assert_array_equal(
            np.argmax(cal.predict_proba(X), axis=1),
            np.argmax(reported, axis=1),
        )

    def test_calibrate_scores_streaming_equivalence(self):
        est, X, reported, y, _, _ = _overconfident_problem(n=600, seed=3)
        cal = TemperatureCalibratedClassifier.fit_from_scores(est, reported, y)
        whole = cal.predict_proba(X)
        parts = np.vstack(
            [cal.calibrate_scores(reported[i : i + 100]) for i in range(0, 600, 100)]
        )
        np.testing.assert_array_equal(whole, parts)

    def test_rows_sum_to_one(self):
        est, X, reported, y, _, _ = _overconfident_problem(n=500, seed=4)
        cal = TemperatureCalibratedClassifier.fit_from_scores(est, reported, y)
        np.testing.assert_allclose(
            cal.predict_proba(X).sum(axis=1), 1.0, atol=1e-12
        )

    def test_binary_positive_column_contract(self):
        # Binary fits accept the (N, 1) positive-class column, the same
        # contract the sigmoid fitter (and the trainer's streaming path)
        # uses.
        rng = np.random.default_rng(5)
        n = 3000
        p_true = rng.uniform(0.05, 0.95, size=n)
        y_idx = (rng.random(n) < p_true).astype(int)
        # Overconfident positive column.
        pos = _softmax(np.column_stack([np.zeros(n), 3.0 * np.log(p_true / (1 - p_true))]))[:, 1]
        classes = np.array(["neg", "pos"])
        full = np.column_stack([1.0 - pos, pos])
        est = _FrozenProbaEstimator(full, classes)
        cal = TemperatureCalibratedClassifier.fit_from_scores(
            est, pos[:, None], classes[y_idx]
        )
        nll_uncal = sklearn.metrics.log_loss(y_idx, full)
        nll_temp = sklearn.metrics.log_loss(
            y_idx, cal.predict_proba(np.arange(n)[:, None])
        )
        assert nll_temp < nll_uncal

    def test_sample_weight_moves_the_fit(self):
        est, X, reported, y, _, _ = _overconfident_problem(n=2000, seed=6)
        cal_flat = TemperatureCalibratedClassifier.fit_from_scores(
            est, reported, y
        )
        w = np.where(np.argmax(reported, axis=1) == 0, 10.0, 0.1)
        cal_w = TemperatureCalibratedClassifier.fit_from_scores(
            est, reported, y, sample_weight=w
        )
        assert cal_flat.temperature_ != cal_w.temperature_


class TestValidation:
    def test_rejects_nonpositive_temperature(self):
        est = _FrozenProbaEstimator(np.full((2, 3), 1 / 3), ["a", "b", "c"])
        with pytest.raises(ValueError, match="positive finite"):
            TemperatureCalibratedClassifier(est, 0.0)
        with pytest.raises(ValueError, match="positive finite"):
            TemperatureCalibratedClassifier(est, float("nan"))

    def test_rejects_unknown_label(self):
        est = _FrozenProbaEstimator(np.full((2, 3), 1 / 3), ["a", "b", "c"])
        with pytest.raises(ValueError, match="not in estimator.classes_"):
            TemperatureCalibratedClassifier.fit_from_scores(
                est, np.full((2, 3), 1 / 3), np.array(["a", "zzz"])
            )

    def test_rejects_column_mismatch(self):
        est = _FrozenProbaEstimator(np.full((2, 3), 1 / 3), ["a", "b", "c"])
        with pytest.raises(ValueError, match="expected 3"):
            TemperatureCalibratedClassifier.fit_from_scores(
                est, np.full((2, 2), 0.5), np.array(["a", "b"])
            )

    def test_fit_temperature_shape_checks(self):
        with pytest.raises(ValueError, match="2-D"):
            fit_temperature(np.zeros(5), np.zeros(5, dtype=int))
        with pytest.raises(ValueError, match="labels length"):
            fit_temperature(np.zeros((5, 3)), np.zeros(4, dtype=int))
