"""Allocator unit tests (reference analog:
tests/training/test_subsample/test_registry.py)."""

import pytest

from mermaid_classifier_tpu.data.subsample import (
    SUBSAMPLE_STRATEGIES,
    SubsampleOptions,
    compute_per_class_targets,
)


def key(i):
    return (f"ba{i}", f"gf{i}")


class TestOptions:
    def test_validation(self):
        with pytest.raises(ValueError, match="strategy"):
            SubsampleOptions(strategy="nope", total_annotations=10)
        with pytest.raises(ValueError, match="total_annotations"):
            SubsampleOptions(strategy="stratified", total_annotations=0)
        with pytest.raises(ValueError, match="min_per_class"):
            SubsampleOptions(total_annotations=10, min_per_class=-1)
        with pytest.raises(ValueError, match="requires total_annotations"):
            SubsampleOptions(strategy="balanced")
        assert set(SUBSAMPLE_STRATEGIES) == {"stratified", "balanced"}

    def test_log_dict(self):
        opts = SubsampleOptions(
            strategy="balanced", total_annotations=100, min_per_class=5
        )
        d = opts.to_log_dict()
        assert d["subsample/strategy"] == "balanced"
        assert d["subsample/enabled"] is True


class TestStratified:
    def test_proportional(self):
        counts = {key(0): 800, key(1): 150, key(2): 50}
        opts = SubsampleOptions(strategy="stratified", total_annotations=100)
        targets = compute_per_class_targets(opts, counts)
        assert targets == {key(0): 80, key(1): 15, key(2): 5}

    def test_never_oversamples(self):
        counts = {key(0): 3, key(1): 1000}
        opts = SubsampleOptions(strategy="stratified", total_annotations=900)
        targets = compute_per_class_targets(opts, counts)
        assert targets[key(0)] <= 3

    def test_min_per_class_floor(self):
        counts = {key(0): 10000, key(1): 40}
        opts = SubsampleOptions(
            strategy="stratified", total_annotations=100, min_per_class=20
        )
        targets = compute_per_class_targets(opts, counts)
        assert targets[key(1)] == 20

    def test_overshoot_trimmed_from_largest(self):
        # Rounding pushes the sum over budget; the largest class absorbs it.
        counts = {key(0): 55, key(1): 55, key(2): 55, key(3): 55}
        opts = SubsampleOptions(strategy="stratified", total_annotations=111)
        targets = compute_per_class_targets(opts, counts)
        assert sum(targets.values()) == 111
        # Deterministic: ties broken by class key.
        again = compute_per_class_targets(opts, counts)
        assert targets == again

    def test_floor_beats_budget(self):
        counts = {key(i): 100 for i in range(4)}
        opts = SubsampleOptions(
            strategy="stratified", total_annotations=10, min_per_class=30
        )
        targets = compute_per_class_targets(opts, counts)
        # Every class at its floor; overshoot accepted.
        assert all(v == 30 for v in targets.values())

    def test_empty_counts(self):
        opts = SubsampleOptions(strategy="stratified", total_annotations=10)
        assert compute_per_class_targets(opts, {}) == {}


class TestBalanced:
    def test_equal_split(self):
        counts = {key(0): 500, key(1): 500, key(2): 500}
        opts = SubsampleOptions(strategy="balanced", total_annotations=300)
        targets = compute_per_class_targets(opts, counts)
        assert targets == {key(0): 100, key(1): 100, key(2): 100}

    def test_caps_at_availability(self):
        counts = {key(0): 30, key(1): 500}
        opts = SubsampleOptions(strategy="balanced", total_annotations=400)
        targets = compute_per_class_targets(opts, counts)
        assert targets == {key(0): 30, key(1): 200}

    def test_min_per_class(self):
        counts = {key(0): 500, key(1): 500}
        opts = SubsampleOptions(
            strategy="balanced", total_annotations=100, min_per_class=75
        )
        targets = compute_per_class_targets(opts, counts)
        assert targets == {key(0): 75, key(1): 75}
