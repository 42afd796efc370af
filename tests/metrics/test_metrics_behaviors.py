"""Per-behavior metric pins, mirroring the reference's per-group test
density (reference analogs: tests/pyspacer/test_metrics_taxonomy_helpers.py
(32 scenarios), test_metrics_calibration/classification/cover/probability/
per_source.py). Fixture tree (tests/common/taxonomy_fixtures):

    ba-hard ── ba-acro ── ba-acro-tab
           └── ba-porites
    ba-algae
"""

import numpy as np
import pytest

from mermaid_classifier_tpu.metrics.taxonomy_index import (
    build_ba_paths,
    build_ba_to_top,
    find_lca,
    group_by_top_level,
    taxonomic_similarity,
)

from tests.common.taxonomy_fixtures import make_ba_library, make_gf_library

CLASSES = [
    "ba-acro-tab::",      # depth-3 leaf
    "ba-acro::gf-br",     # depth-2, with growth form
    "ba-porites::",       # depth-2 sibling of ba-acro
    "ba-hard::",          # root used as a class
    "ba-algae::",         # other root
]


@pytest.fixture(scope="module")
def ba_library():
    return make_ba_library()


@pytest.fixture(scope="module")
def paths(ba_library):
    return build_ba_paths(CLASSES, ba_library)


class TestBaPaths:
    def test_leaf_path_is_root_to_leaf(self, paths):
        assert paths["ba-acro-tab"] == ["ba-hard", "ba-acro", "ba-acro-tab"]

    def test_mid_path(self, paths):
        assert paths["ba-porites"] == ["ba-hard", "ba-porites"]

    def test_root_path_is_just_root(self, paths):
        assert paths["ba-hard"] == ["ba-hard"]
        assert paths["ba-algae"] == ["ba-algae"]

    def test_growth_forms_do_not_duplicate_bas(self, ba_library):
        # 'ba-acro::gf-br' and a bare 'ba-acro::' key the same BA once.
        paths = build_ba_paths(["ba-acro::gf-br", "ba-acro::"], ba_library)
        assert set(paths) == {"ba-acro"}

    def test_all_class_bas_present(self, paths):
        assert set(paths) == {
            "ba-acro-tab", "ba-acro", "ba-porites", "ba-hard", "ba-algae",
        }


class TestBaToTop:
    def test_maps_leaves_to_roots(self, ba_library):
        top = build_ba_to_top(CLASSES, ba_library)
        assert top["ba-acro-tab"] == "ba-hard"
        assert top["ba-acro"] == "ba-hard"
        assert top["ba-porites"] == "ba-hard"

    def test_roots_map_to_themselves(self, ba_library):
        top = build_ba_to_top(CLASSES, ba_library)
        assert top["ba-hard"] == "ba-hard"
        assert top["ba-algae"] == "ba-algae"


class TestLca:
    def test_same_node_returns_itself(self, paths):
        assert find_lca("ba-acro", "ba-acro", paths) == "ba-acro"

    def test_siblings_return_parent(self, paths):
        assert find_lca("ba-acro", "ba-porites", paths) == "ba-hard"

    def test_root_and_leaf_same_branch_returns_root(self, paths):
        assert find_lca("ba-hard", "ba-acro-tab", paths) == "ba-hard"

    def test_ancestor_and_descendant_returns_ancestor(self, paths):
        assert find_lca("ba-acro", "ba-acro-tab", paths) == "ba-acro"

    def test_different_roots_returns_none(self, paths):
        assert find_lca("ba-acro", "ba-algae", paths) is None

    def test_symmetry(self, paths):
        for a in paths:
            for b in paths:
                assert find_lca(a, b, paths) == find_lca(b, a, paths)


class TestTaxonomicSimilarity:
    def test_same_node_returns_one(self, paths):
        assert taxonomic_similarity("ba-acro-tab", "ba-acro-tab", paths) == 1.0

    def test_siblings_share_root_fraction(self, paths):
        # ba-acro vs ba-porites: shared prefix 1 over depth 2.
        assert taxonomic_similarity("ba-acro", "ba-porites", paths) == 0.5

    def test_ancestor_fraction(self, paths):
        # ba-acro (depth 2) vs ba-acro-tab (depth 3): shared 2 / max 3.
        assert taxonomic_similarity(
            "ba-acro", "ba-acro-tab", paths
        ) == pytest.approx(2 / 3)

    def test_different_roots_return_zero(self, paths):
        assert taxonomic_similarity("ba-hard", "ba-algae", paths) == 0.0
        assert taxonomic_similarity("ba-acro-tab", "ba-algae", paths) == 0.0

    def test_symmetry(self, paths):
        for a in paths:
            for b in paths:
                assert taxonomic_similarity(a, b, paths) == pytest.approx(
                    taxonomic_similarity(b, a, paths)
                )


class TestGroupByTopLevel:
    def _grouped(self, ba_library, gt_indices, min_samples=1):
        top = build_ba_to_top(CLASSES, ba_library)
        return group_by_top_level(
            list(range(len(gt_indices))), gt_indices, CLASSES, top,
            ba_library, min_samples=min_samples,
        )

    def test_groups_by_top_level_ba(self, ba_library):
        # gt classes: two hard-coral branches + one algae.
        groups = self._grouped(ba_library, [0, 2, 4, 1])
        by_id = {g["top_ba_id"]: g for g in groups}
        assert set(by_id) == {"ba-hard", "ba-algae"}
        assert sorted(by_id["ba-hard"]["indices"]) == [0, 1, 3]
        assert by_id["ba-algae"]["indices"] == [2]

    def test_group_fields_and_names_from_library(self, ba_library):
        group = self._grouped(ba_library, [4])[0]
        assert set(group) == {"top_ba_id", "name", "indices", "n_samples"}
        assert group["name"] == "Macroalgae"
        assert group["n_samples"] == len(group["indices"]) == 1

    def test_min_samples_filters_small_groups(self, ba_library):
        groups = self._grouped(ba_library, [0, 1, 2, 4], min_samples=2)
        assert [g["top_ba_id"] for g in groups] == ["ba-hard"]

    def test_all_below_min_samples_returns_no_groups(self, ba_library):
        assert self._grouped(ba_library, [0, 4], min_samples=5) == []

    def test_empty_sample_indices_returns_no_groups(self, ba_library):
        top = build_ba_to_top(CLASSES, ba_library)
        assert group_by_top_level([], [], CLASSES, top, ba_library) == []


class TestAdaptiveEce:
    def test_perfectly_calibrated_low_ece(self):
        from mermaid_classifier_tpu.metrics.calibration import adaptive_ece

        rng = np.random.default_rng(0)
        n = 4000
        conf = rng.uniform(0.2, 1.0, n)
        correct = rng.random(n) < conf  # accuracy == confidence
        est = np.zeros(n, dtype=int)
        gt = np.where(correct, 0, 1)
        ece, bins = adaptive_ece(conf, gt, est)
        assert ece < 0.05
        assert isinstance(ece, float)

    def test_maximally_overconfident_high_ece(self):
        from mermaid_classifier_tpu.metrics.calibration import adaptive_ece

        n = 1000
        conf = np.full(n, 0.99)
        gt = np.ones(n, dtype=int)
        est = np.zeros(n, dtype=int)  # always wrong at 0.99 confidence
        ece, _ = adaptive_ece(conf, gt, est)
        assert ece > 0.9

    def test_equal_mass_bin_structure(self):
        from mermaid_classifier_tpu.metrics.calibration import adaptive_ece

        rng = np.random.default_rng(1)
        n, n_bins = 2000, 20
        conf = rng.uniform(0, 1, n)
        gt = np.zeros(n, dtype=int)
        est = np.zeros(n, dtype=int)
        _, bins = adaptive_ece(conf, gt, est, n_bins=n_bins)
        assert len(bins) == n_bins
        counts = [b["count"] for b in bins]
        assert sum(counts) == n
        assert max(counts) - min(counts) <= 1  # equal mass
        # Bins are sorted by confidence and non-overlapping.
        for prev, cur in zip(bins, bins[1:]):
            assert prev["conf_max"] <= cur["conf_min"] + 1e-12
        assert set(bins[0]) == {
            "avg_confidence", "avg_accuracy", "count", "conf_min", "conf_max",
        }


class TestClassificationEdges:
    def _ctx(self, gt, est, scores=None):
        from mermaid_classifier_tpu.data.results import ValResults
        from mermaid_classifier_tpu.metrics import MetricsContext

        n = len(gt)
        return MetricsContext(
            val_results=ValResults(
                scores=list(scores) if scores is not None else [0.9] * n,
                gt=list(gt),
                est=list(est),
                classes=list(CLASSES),
            ),
            ba_library=make_ba_library(),
            gf_library=make_gf_library(),
        )

    def test_perfect_predictions_max_scores(self):
        from mermaid_classifier_tpu.metrics.classification import (
            compute_balanced_accuracy_mcc,
            compute_precision_recall_f1,
        )

        gt = [0, 1, 2, 3, 4] * 8
        ctx = self._ctx(gt, gt)
        out = compute_precision_recall_f1(ctx)
        assert out.scalars["precision_macro"] == pytest.approx(1.0)
        assert out.scalars["recall_macro"] == pytest.approx(1.0)
        assert out.scalars["f1_macro"] == pytest.approx(1.0)
        out2 = compute_balanced_accuracy_mcc(ctx)
        assert out2.scalars["balanced_accuracy"] == pytest.approx(1.0)
        assert out2.scalars["mcc"] == pytest.approx(1.0)

    def test_all_wrong_predictions_zero_scores(self):
        from mermaid_classifier_tpu.metrics.classification import (
            compute_balanced_accuracy_mcc,
            compute_precision_recall_f1,
        )

        gt = [0, 1] * 20
        est = [1, 0] * 20
        ctx = self._ctx(gt, est)
        out = compute_precision_recall_f1(ctx)
        assert out.scalars["f1_macro"] == pytest.approx(0.0)
        out2 = compute_balanced_accuracy_mcc(ctx)
        assert out2.scalars["balanced_accuracy"] == pytest.approx(0.0)
        assert out2.scalars["mcc"] <= 0.0


class TestProbabilityBehaviors:
    """compute_probability: perfect ~0 log loss, uniform = log K, and the
    per-category table honors min_samples (reference analog:
    test_metrics_probability.py)."""

    # sklearn's log_loss binarizes labels in SORTED order, so the proba
    # columns (and clf.classes_) must be sorted — as the production
    # classifier's np.unique classes_ always are.
    SORTED = sorted(CLASSES)

    def _ctx(self, proba, gt_labels):
        from mermaid_classifier_tpu.data.results import ValResults
        from mermaid_classifier_tpu.metrics import MetricsContext

        SORTED = self.SORTED

        class _Clf:
            classes_ = list(SORTED)

        n = len(gt_labels)
        idx = {c: i for i, c in enumerate(SORTED)}
        gt_idx = [idx[g] for g in gt_labels]
        return MetricsContext(
            val_results=ValResults(
                scores=[0.9] * n, gt=gt_idx, est=gt_idx,
                classes=list(SORTED),
            ),
            ba_library=make_ba_library(),
            gf_library=make_gf_library(),
            clf=_Clf(),
            val_proba=np.asarray(proba, dtype=float),
            val_gt_labels=list(gt_labels),
        )

    def test_perfect_probability_matrix(self):
        from mermaid_classifier_tpu.metrics.probability import (
            compute_probability,
        )

        n = 60
        gt = [self.SORTED[i % len(self.SORTED)] for i in range(n)]
        idx = {c: i for i, c in enumerate(self.SORTED)}
        proba = np.full((n, len(CLASSES)), 1e-9)
        for i, g in enumerate(gt):
            proba[i, idx[g]] = 1.0
        proba /= proba.sum(axis=1, keepdims=True)
        out = compute_probability(self._ctx(proba, gt))
        assert out.scalars["log_loss"] == pytest.approx(0.0, abs=1e-6)

    def test_uniform_probability_matrix_is_log_k(self):
        from mermaid_classifier_tpu.metrics.probability import (
            compute_probability,
        )

        n, k = 50, len(self.SORTED)
        gt = [self.SORTED[i % k] for i in range(n)]
        proba = np.full((n, k), 1.0 / k)
        out = compute_probability(self._ctx(proba, gt))
        assert out.scalars["log_loss"] == pytest.approx(np.log(k), rel=1e-6)

    def test_per_category_respects_min_samples(self):
        from mermaid_classifier_tpu.metrics.probability import (
            compute_probability,
        )

        k = len(self.SORTED)
        # 40 hard-coral points (>= the 30 floor), 5 algae (< floor).
        gt = ["ba-acro::gf-br"] * 40 + ["ba-algae::"] * 5
        proba = np.full((len(gt), k), 1.0 / k)
        out = compute_probability(self._ctx(proba, gt))
        table = out.tables()[0].payload
        assert list(table["category"]) == ["Hard coral"]


class TestRankingBehaviors:
    """topk_and_mrr edges (reference analog: test_metrics_ranking.py)."""

    def test_true_class_always_first(self):
        from mermaid_classifier_tpu.metrics.ranking import topk_and_mrr

        classes = sorted(CLASSES)
        n, k = 30, len(classes)
        proba = np.full((n, k), 0.01)
        gt = [classes[i % k] for i in range(n)]
        for i, g in enumerate(gt):
            proba[i, classes.index(g)] = 0.9
        result = topk_and_mrr(proba, gt, classes)
        assert result["topk"][1] == 1.0
        assert result["mrr"] == 1.0
        assert (result["ranks"] == 1).all()

    def test_true_class_always_second(self):
        from mermaid_classifier_tpu.metrics.ranking import topk_and_mrr

        classes = sorted(CLASSES)
        k = len(classes)
        n = 20
        proba = np.full((n, k), 0.01)
        gt = [classes[1]] * n
        proba[:, 0] = 0.9   # wrong class first
        proba[:, 1] = 0.5   # true class second
        result = topk_and_mrr(proba, gt, classes)
        assert result["topk"][1] == 0.0
        assert result["topk"][3] == 1.0
        assert result["mrr"] == pytest.approx(0.5)
        assert (result["ranks"] == 2).all()

    def test_topk_monotone_in_k(self):
        from mermaid_classifier_tpu.metrics.ranking import KS, topk_and_mrr

        rng = np.random.default_rng(0)
        classes = sorted(CLASSES)
        proba = rng.random((100, len(classes)))
        proba /= proba.sum(axis=1, keepdims=True)
        gt = [classes[i] for i in rng.integers(0, len(classes), 100)]
        topk = topk_and_mrr(proba, gt, classes)["topk"]
        values = [topk[k] for k in KS]
        assert values == sorted(values)
        assert topk[max(KS)] == 1.0  # K >= n_classes covers everything


class TestCoordinatorFailureIsolation:
    """One failing group must not take down the run, and the healthy
    groups must still log (reference analog:
    test_metrics_coordinator.py:failed_group_* scenarios)."""

    def test_failing_group_is_isolated(self, tmp_path, monkeypatch):
        from mermaid_classifier_tpu.data.results import ValResults
        from mermaid_classifier_tpu.metrics import (
            MetricsContext,
            MetricsCoordinator,
        )
        from mermaid_classifier_tpu.metrics import groups as groups_mod
        from mermaid_classifier_tpu.tracking.local_tracker import LocalTracker

        classes = sorted(CLASSES)
        rng = np.random.default_rng(0)
        n = 60
        gt = rng.integers(0, len(classes), n).tolist()
        val_results = ValResults(
            scores=[0.8] * n, gt=gt, est=list(gt), classes=classes
        )
        ctx = MetricsContext(
            val_results=val_results,
            ba_library=make_ba_library(),
            gf_library=make_gf_library(),
        )

        # Sabotage ONE registered group (frozen dataclass in the module
        # registry: swap the entry, monkeypatch restores it afterwards).
        import dataclasses

        groups_mod.all_groups()  # force registration
        victim = groups_mod._REGISTERED["calibration"]

        def boom(ctx):
            raise RuntimeError("boom")

        monkeypatch.setitem(
            groups_mod._REGISTERED, "calibration",
            dataclasses.replace(victim, compute=boom),
        )

        tracker = LocalTracker(tmp_path / "t")
        with tracker.start_run("isolation") as run:
            MetricsCoordinator(ctx, run).compute_and_log_all()

        metrics = run.latest_metrics()
        # The sabotaged group's scalar is absent; healthy groups logged.
        assert "ece" not in metrics
        assert "balanced_accuracy" in metrics
        assert "f1_macro" in metrics


class TestTaxonomicAttribution:
    """LCA error attribution + GF differentiation with engineered
    confusions (reference analog: test_metrics_taxonomic.py)."""

    def _ctx(self, gt, est):
        from mermaid_classifier_tpu.data.results import ValResults
        from mermaid_classifier_tpu.metrics import MetricsContext

        n = len(gt)
        return MetricsContext(
            val_results=ValResults(
                scores=[0.9] * n, gt=list(gt), est=list(est),
                classes=list(CLASSES),
            ),
            ba_library=make_ba_library(),
            gf_library=make_gf_library(),
        )

    def test_pure_cross_branch_errors(self):
        from mermaid_classifier_tpu.metrics.taxonomic import compute_taxonomic

        # acro (hard coral) always predicted as algae: every error crosses
        # the top level.
        gt = [1] * 40   # ba-acro::gf-br
        est = [4] * 40  # ba-algae::
        out = compute_taxonomic(self._ctx(gt, est))
        assert out.scalars["cross_branch_error_rate"] == 1.0
        assert out.scalars["within_branch_error_rate"] == 0.0

    def test_pure_within_branch_errors(self):
        from mermaid_classifier_tpu.metrics.taxonomic import compute_taxonomic

        # acro confused with its SIBLING porites: all errors stay inside
        # the hard-coral branch.
        gt = [1] * 40   # ba-acro::gf-br
        est = [2] * 40  # ba-porites::
        out = compute_taxonomic(self._ctx(gt, est))
        assert out.scalars["cross_branch_error_rate"] == 0.0
        assert out.scalars["within_branch_error_rate"] == 1.0

    def test_no_errors_rates_are_zero(self):
        from mermaid_classifier_tpu.metrics.taxonomic import compute_taxonomic

        gt = [0, 1, 2, 3, 4] * 8
        out = compute_taxonomic(self._ctx(gt, gt))
        assert out.scalars["cross_branch_error_rate"] == 0.0
        assert out.scalars["within_branch_error_rate"] == 0.0

    def test_mixed_attribution_fractions(self):
        from mermaid_classifier_tpu.metrics.taxonomic import compute_taxonomic

        # 3 within-branch errors (acro->porites) + 1 cross (acro->algae),
        # plus correct rows that must not count.
        gt = [1, 1, 1, 1, 0, 2]
        est = [2, 2, 2, 4, 0, 2]
        out = compute_taxonomic(self._ctx(gt, est))
        assert out.scalars["cross_branch_error_rate"] == pytest.approx(0.25)
        assert out.scalars["within_branch_error_rate"] == pytest.approx(0.75)

    def test_gf_accuracy_among_relevant_samples(self):
        from mermaid_classifier_tpu.metrics.taxonomic import compute_taxonomic

        # gt 'ba-acro::gf-br' predicted as the same class half the time
        # and as bare 'ba-acro-tab::' (no GF) the other half: GF accuracy
        # over GF-relevant rows = 0.5; when the BA matched the GF matched.
        gt = [1, 1, 1, 1]
        est = [1, 0, 1, 0]
        out = compute_taxonomic(self._ctx(gt, est))
        assert out.scalars["gf_accuracy_gf_relevant"] == pytest.approx(0.5)
        assert out.scalars["within_ba_gf_accuracy"] == pytest.approx(1.0)


class TestCoverBehaviors:
    """Per-image cover reconstruction (reference analog:
    test_metrics_cover.py): perfect predictions, vectors summing to one,
    and a deliberate bias showing up signed."""

    def _ctx_with_dataset(self, per_image_labels, est_labels_flat):
        from types import SimpleNamespace

        from mermaid_classifier_tpu.data.results import ValResults
        from mermaid_classifier_tpu.metrics import MetricsContext

        class_to_idx = {c: i for i, c in enumerate(CLASSES)}
        val_data = {}
        gt = []
        for img_idx, labels in enumerate(per_image_labels):
            key = f"img{img_idx:02d}"
            val_data[key] = [(r, r * 2, lab) for r, lab in enumerate(labels)]
            gt.extend(class_to_idx[lab] for lab in labels)
        est = [class_to_idx[lab] for lab in est_labels_flat]
        dataset = SimpleNamespace(
            labels=SimpleNamespace(val=SimpleNamespace(data=val_data))
        )
        return MetricsContext(
            val_results=ValResults(
                scores=[0.9] * len(gt), gt=gt, est=est,
                classes=list(CLASSES),
            ),
            ba_library=make_ba_library(),
            gf_library=make_gf_library(),
            dataset=dataset,
        )

    def test_perfect_predictions_zero_bias(self):
        from mermaid_classifier_tpu.metrics.cover import compute_cover

        per_image = [
            ["ba-acro::gf-br"] * 3 + ["ba-algae::"],
            ["ba-porites::"] * 2 + ["ba-algae::"] * 2,
        ]
        flat = [lab for labels in per_image for lab in labels]
        out = compute_cover(self._ctx_with_dataset(per_image, flat))
        table = out.tables()[0].payload
        assert np.allclose(table["bias_pct"], 0.0)
        assert np.allclose(table["rmse_pct"], 0.0)
        # True cover percentages are per-image means and sum to 100.
        assert table["mean_true_cover_pct"].sum() == pytest.approx(100.0)

    def test_systematic_bias_is_signed(self):
        from mermaid_classifier_tpu.metrics.cover import compute_cover

        # Every image: half acro / half algae in truth, but predictions
        # call EVERYTHING algae -> algae bias +50 pts, acro -50.
        per_image = [["ba-acro::gf-br", "ba-algae::"] * 2 for _ in range(3)]
        flat = ["ba-algae::"] * 12
        out = compute_cover(self._ctx_with_dataset(per_image, flat))
        table = out.tables()[0].payload.set_index("bagf_id")
        assert table.loc["ba-algae::", "bias_pct"] == pytest.approx(50.0)
        assert table.loc["ba-acro::gf-br", "bias_pct"] == pytest.approx(-50.0)


class TestPerSourceBehaviors:
    """Per-source breakdown (reference analog: test_metrics_per_source.py):
    correct split, annotation-count-descending sort, min/max scalars, and
    the graceful no-source-map skip."""

    def _ctx(self, sources):
        """sources: list of (source_id, labels, est_labels)."""
        from types import SimpleNamespace

        from mermaid_classifier_tpu.data.results import ValResults
        from mermaid_classifier_tpu.metrics import MetricsContext

        class_to_idx = {c: i for i, c in enumerate(CLASSES)}
        val_data, fmap = {}, {}
        gt, est = [], []
        for img_idx, (source_id, labels, est_labels) in enumerate(sources):
            key = f"img{img_idx:02d}"
            val_data[key] = [(r, r, lab) for r, lab in enumerate(labels)]
            fmap[key] = ("coralnet", source_id)
            gt.extend(class_to_idx[lab] for lab in labels)
            est.extend(class_to_idx[lab] for lab in est_labels)
        dataset = SimpleNamespace(
            labels=SimpleNamespace(val=SimpleNamespace(data=val_data)),
            feature_path_to_source=fmap,
        )
        return MetricsContext(
            val_results=ValResults(
                scores=[0.9] * len(gt), gt=gt, est=est,
                classes=list(CLASSES),
            ),
            ba_library=make_ba_library(),
            gf_library=make_gf_library(),
            dataset=dataset,
        )

    def test_two_sources_split_and_scored(self):
        from mermaid_classifier_tpu.metrics.per_source import (
            compute_per_source,
        )

        # Source 1: perfect. Source 2: all wrong.
        acro, alg = "ba-acro::gf-br", "ba-algae::"
        ctx = self._ctx([
            ("1", [acro] * 4, [acro] * 4),
            ("2", [alg] * 4, [acro] * 4),
        ])
        out = compute_per_source(ctx)
        df = out.tables()[0].payload.set_index("source_id")
        assert df.loc["1", "accuracy"] == 1.0
        assert df.loc["2", "accuracy"] == 0.0
        assert out.scalars["per_source/min_accuracy"] == 0.0
        assert out.scalars["per_source/max_accuracy"] == 1.0
        assert out.scalars["per_source/n_sources"] == 2.0
        # Source 2's errors cross the top level (algae -> acro).
        assert df.loc["2", "cross_branch_error_rate"] == 1.0
        assert df.loc["1", "cross_branch_error_rate"] == 0.0

    def test_sorted_by_annotation_count_desc(self):
        from mermaid_classifier_tpu.metrics.per_source import (
            compute_per_source,
        )

        acro = "ba-acro::gf-br"
        ctx = self._ctx([
            ("small", [acro] * 2, [acro] * 2),
            ("big", [acro] * 6, [acro] * 6),
            ("mid", [acro] * 4, [acro] * 4),
        ])
        df = compute_per_source(ctx).tables()[0].payload
        assert list(df["source_id"]) == ["big", "mid", "small"]
        assert list(df["num_val_annotations"]) == [6, 4, 2]

    def test_missing_source_map_skips_gracefully(self):
        from mermaid_classifier_tpu.metrics.per_source import (
            compute_per_source,
        )

        ctx = self._ctx([("1", ["ba-algae::"] * 3, ["ba-algae::"] * 3)])
        ctx.dataset.feature_path_to_source = None
        out = compute_per_source(ctx)
        assert out.scalars == {}
        assert out.tables() == []


class TestCoordinatorInvalidContext:
    """The coordinator never raises on an invalid context and logs
    nothing (reference analog: test_metrics_coordinator.py:
    does_not_raise_on_invalid_context / no_metrics_logged)."""

    def test_invalid_context_skips_without_raising(self, tmp_path):
        from mermaid_classifier_tpu.data.results import ValResults
        from mermaid_classifier_tpu.metrics import (
            MetricsContext,
            MetricsCoordinator,
        )
        from mermaid_classifier_tpu.tracking.local_tracker import LocalTracker

        # A class the taxonomy library cannot resolve -> context
        # validation failure (ValResults itself index-validates eagerly,
        # so the invalid input has to be semantic, not structural).
        ctx = MetricsContext(
            val_results=ValResults(
                scores=[0.9, 0.9], gt=[0, 1], est=[0, 1],
                classes=["ba-unknown::", "ba-algae::"],
            ),
            ba_library=make_ba_library(),
            gf_library=make_gf_library(),
        )
        tracker = LocalTracker(tmp_path / "t")
        with tracker.start_run("invalid") as run:
            MetricsCoordinator(ctx, run).compute_and_log_all()  # no raise
        assert run.latest_metrics() == {}
        assert run.list_artifacts() == []
