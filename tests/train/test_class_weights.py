"""Effective-number weighting tests (reference analog:
tests/training/test_sample_weighting/)."""

import pytest

from mermaid_classifier_tpu.train.class_weights import (
    BETA,
    SampleWeightingOptions,
    compute_class_weights,
)


class TestOptions:
    def test_cap_validation(self):
        with pytest.raises(ValueError, match="weight_ratio_cap"):
            SampleWeightingOptions(enabled=True, weight_ratio_cap=0.5)
        SampleWeightingOptions(enabled=True, weight_ratio_cap=1.0)

    def test_log_dict(self):
        d = SampleWeightingOptions(enabled=True, weight_ratio_cap=5000).to_log_dict()
        assert d["sample_weighting/strategy"] == "effective_number"
        assert d["sample_weighting/weight_ratio_cap"] == 5000


class TestComputeClassWeights:
    def test_disabled_returns_empty(self):
        assert compute_class_weights({"a": 10}, SampleWeightingOptions()) == {}

    def test_empty_counts(self):
        assert (
            compute_class_weights({}, SampleWeightingOptions(enabled=True)) == {}
        )

    def test_rarer_class_weighs_more(self):
        w = compute_class_weights(
            {"rare": 10, "common": 10000}, SampleWeightingOptions(enabled=True)
        )
        assert w["rare"] > w["common"] > 0

    def test_effective_number_formula(self):
        w = compute_class_weights({"a": 5}, SampleWeightingOptions(enabled=True))
        effective_n = (1.0 - BETA**5) / (1.0 - BETA)
        assert w["a"] == pytest.approx(1.0 / effective_n)

    def test_ratio_cap(self):
        opts = SampleWeightingOptions(enabled=True, weight_ratio_cap=3.0)
        w = compute_class_weights({"rare": 1, "common": 1_000_000}, opts)
        assert max(w.values()) / min(w.values()) <= 3.0 + 1e-12

    def test_count_floor_at_one(self):
        w = compute_class_weights(
            {"zero": 0, "one": 1}, SampleWeightingOptions(enabled=True)
        )
        assert w["zero"] == w["one"]
