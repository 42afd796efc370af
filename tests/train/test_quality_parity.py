"""The composed-chain quality keystone: full repo pipeline vs sklearn on
identical data, asserted to agree.

Every chain link is differential-tested in isolation; this is the one test
that composes subsample -> train -> calibrate -> export -> load -> metrics
through BOTH stacks and asserts the resulting quality numbers agree within
a band (reference quality evidence this mirrors:
docs/research/balancing-experiments.md:49-84 — accuracy 0.812–0.824,
balanced accuracy 0.774 for the production C2 recipe at full scale).

Bands are set for the CI spec's scale (~2k val points): the binomial
sampling std of an accuracy estimate there is ~1%, and the two stacks
train with different init/shuffle streams, so agreement to a few percent
is the strongest non-flaky claim available. The bench-scale run
(scripts/quality_parity_bench.py) tightens this with more data.
"""

from __future__ import annotations

import numpy as np
import pytest

from mermaid_classifier_tpu.train.quality_parity import (
    QualityRunSpec,
    run_quality_parity,
)

ACC_BAND = 0.02
BAL_ACC_BAND = 0.04
LOG_LOSS_BAND = 0.10


@pytest.fixture(scope="module")
def result():
    return run_quality_parity(QualityRunSpec())


class TestQualityParity:
    def test_problem_is_nontrivial(self, result):
        # The dataset must be hard enough that parity is a real claim: a
        # saturated 1.0-accuracy problem would hide model-quality bugs.
        assert 0.55 < result["sklearn_accuracy"] < 0.97
        assert result["n_classes"] >= 15

    def test_accuracy_parity(self, result):
        assert abs(result["accuracy_delta"]) <= ACC_BAND, result

    def test_balanced_accuracy_parity(self, result):
        assert abs(result["balanced_accuracy_delta"]) <= BAL_ACC_BAND, result

    def test_log_loss_parity(self, result):
        assert abs(result["log_loss_delta"]) <= LOG_LOSS_BAND, result

    def test_calibrated_probabilities_sane(self, result):
        # Calibrated log loss must beat the uniform-prediction baseline by
        # a wide margin on both sides (a broken calibrator degrades toward
        # uniform).
        uniform = float(np.log(result["n_classes"]))
        assert result["repo_log_loss"] < 0.7 * uniform
        assert result["sklearn_log_loss"] < 0.7 * uniform


#: Small-but-real spec for the multi-seed aggregate: big enough that both
#: stacks train a usable model, small enough for seconds-fast CI.
MULTISEED_SPEC = QualityRunSpec(
    n_samples=3600,
    n_features=48,
    n_classes=8,
    cluster_std=4.0,
    hidden=(32, 16),
    epochs=10,
    subsample_total=2400,
    min_per_class=40,
    init="sklearn",
)


class TestQualityParityMultiseed:
    @pytest.fixture(scope="class")
    def multi(self):
        from mermaid_classifier_tpu.train.quality_parity import (
            run_quality_parity_multiseed,
        )

        return run_quality_parity_multiseed(MULTISEED_SPEC, seeds=(0, 1, 2))

    def test_structure(self, multi):
        assert multi["seeds"] == [0, 1, 2]
        assert len(multi["per_seed"]) == 3
        for key in ("accuracy_delta", "balanced_accuracy_delta",
                    "log_loss_delta"):
            band = multi["deltas"][key]
            assert band["ci95_low"] <= band["mean"] <= band["ci95_high"]
            assert band["std"] >= 0.0
            assert band["ci_contains_zero"] == (
                band["ci95_low"] <= 0.0 <= band["ci95_high"]
            )

    def test_seeds_actually_vary_the_draw(self, multi):
        # Each seed must re-draw data + splits + init: identical per-seed
        # rows would mean the seed is not reaching the generators and the
        # CI is fake (std 0 over copies).
        accs = [r["sklearn_accuracy"] for r in multi["per_seed"]]
        assert len(set(accs)) > 1, accs

    def test_matched_init_band_is_tight(self, multi):
        # The matched-init pipeline residual must stay small for EVERY
        # seed, not just on average (this is the multi-seed form of the
        # single-seed bands above).
        for row in multi["per_seed"]:
            assert abs(row["balanced_accuracy_delta"]) <= 1.5 * BAL_ACC_BAND

    def test_too_few_seeds_rejected(self):
        from mermaid_classifier_tpu.train.quality_parity import (
            run_quality_parity_multiseed,
        )

        with pytest.raises(ValueError):
            run_quality_parity_multiseed(MULTISEED_SPEC, seeds=(0,))
