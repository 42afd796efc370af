"""Metrics suite tests: context validation, registry gating, every group's
outputs on synthetic results, coordinator end-to-end logging
(reference analog: tests/pyspacer/ metric tests + metrics_test_helpers)."""

import numpy as np
import pytest

from mermaid_classifier_tpu.data.results import ValResults
from mermaid_classifier_tpu.metrics import (
    REPORT_ORDER,
    MetricsContext,
    MetricsContextError,
    MetricsCoordinator,
    all_groups,
    runnable_groups,
)
from mermaid_classifier_tpu.metrics.calibration import adaptive_ece, compute_calibration
from mermaid_classifier_tpu.metrics.classification import (
    compute_balanced_accuracy_mcc,
    compute_confusion_matrices,
    compute_precision_recall_f1,
)
from mermaid_classifier_tpu.metrics.ranking import compute_ranking, topk_and_mrr
from mermaid_classifier_tpu.metrics.taxonomic import compute_taxonomic
from mermaid_classifier_tpu.metrics.taxonomy_index import (
    build_ba_paths,
    find_lca,
    taxonomic_similarity,
)
from mermaid_classifier_tpu.tracking.local_tracker import LocalTracker

from tests.common.taxonomy_fixtures import make_ba_library, make_gf_library

# Classes spanning two branches of the fixture tree + growth forms.
CLASSES = [
    "ba-acro::gf-br",
    "ba-acro-tab::",
    "ba-porites::gf-ma",
    "ba-algae::",
]


def make_val_results(n=400, accuracy=0.7, seed=0):
    rng = np.random.default_rng(seed)
    gt = rng.integers(0, len(CLASSES), n).tolist()
    est = [
        g if rng.random() < accuracy else int(rng.integers(0, len(CLASSES)))
        for g in gt
    ]
    scores = (0.5 + 0.5 * rng.random(n)).tolist()
    return ValResults(scores=scores, gt=gt, est=list(est), classes=list(CLASSES))


@pytest.fixture()
def ctx():
    return MetricsContext(
        val_results=make_val_results(),
        ba_library=make_ba_library(),
        gf_library=make_gf_library(),
    )


def scalar_names(out):
    return set(out.scalars)


def artifact_paths(out):
    return {a.path for a in out.artifacts}


class TestContextValidation:
    def test_empty_predictions(self, ctx):
        ctx.val_results = ValResults(scores=[], gt=[], est=[], classes=CLASSES)
        with pytest.raises(MetricsContextError, match="no ground truth"):
            ctx.validate()

    def test_unresolvable_class(self):
        vr = make_val_results()
        vr.classes = ["not-a-ba::"] * len(CLASSES)
        bad = MetricsContext(
            val_results=vr, ba_library=make_ba_library(), gf_library=make_gf_library()
        )
        with pytest.raises(MetricsContextError, match="not found in ba_library"):
            bad.validate()

    def test_valid(self, ctx):
        ctx.validate()


class TestRegistry:
    def test_gating(self, ctx):
        names = [g.name for g in runnable_groups(ctx)]
        assert "cover" not in names and "probability" not in names
        ctx.dataset = object()
        ctx.val_proba = np.ones((4, 4))
        names = [g.name for g in runnable_groups(ctx)]
        assert names == list(REPORT_ORDER)

    def test_nine_groups(self):
        assert len(all_groups()) == 9
        assert [g.name for g in all_groups()] == list(REPORT_ORDER)

    def test_double_registration_rejected(self):
        from mermaid_classifier_tpu.metrics import metric_group

        with pytest.raises(ValueError, match="registered twice"):
            metric_group("calibration")(lambda ctx: None)

    def test_unknown_needs_rejected(self):
        from mermaid_classifier_tpu.metrics import metric_group

        with pytest.raises(ValueError, match="unknown context fields"):
            metric_group("brand-new", needs=("not_a_field",))(lambda ctx: None)


class TestClassificationGroups:
    def test_confusion_matrices(self, ctx):
        result = compute_confusion_matrices(ctx)
        assert artifact_paths(result) >= {
            "confusion_matrix/frequencies",
            "confusion_matrix/frequencies.png",
            "confusion_matrix/percents",
            "confusion_matrix/percents.png",
        }
        freq_df = result.tables()[0].payload
        # Total count preserved under reordering.
        assert freq_df.iloc[:, 1:].to_numpy().sum() == len(ctx.val_results.gt)

    def test_confusion_figures_cap_raster_and_skip_tight_bbox(self, ctx):
        """The figures ship savefig kwargs capping the long raster side at
        2400 px and disabling the tight-bbox re-render (the 58 s -> ~20 s
        fix for the metrics stage at C2 scale). Small class counts stay at
        dpi 100; the cap engages when figsize grows past 24 in."""
        from mermaid_classifier_tpu.metrics.classification import (
            _CONFUSION_MAX_RASTER_PX,
        )

        result = compute_confusion_matrices(ctx)
        figures = result.figures()
        assert len(figures) == 2
        for art in figures:
            assert art.save_kwargs is not None
            assert art.save_kwargs["bbox_inches"] is None
            fig_size = max(art.payload.get_size_inches())
            assert art.save_kwargs["dpi"] == min(
                100.0, _CONFUSION_MAX_RASTER_PX / fig_size
            )
            assert fig_size * art.save_kwargs["dpi"] <= _CONFUSION_MAX_RASTER_PX
            import matplotlib.pyplot as plt

            plt.close(art.payload)

    def test_confusion_dpi_cap_engages_at_production_class_counts(self):
        """At >40 classes the figure outgrows 24 in and the dpi drops below
        100 so the raster stays at the cap (the production 80-class case)."""
        import matplotlib.pyplot as plt

        from mermaid_classifier_tpu.metrics.classification import (
            _CONFUSION_MAX_RASTER_PX,
            _confusion_figure,
        )

        n = 48
        fig, kwargs = _confusion_figure(
            np.eye(n, dtype=np.int64), [f"c{i}" for i in range(n)]
        )
        plt.close(fig)
        assert kwargs["dpi"] < 100.0
        assert max(fig.get_size_inches()) * kwargs["dpi"] == pytest.approx(
            _CONFUSION_MAX_RASTER_PX
        )

    def test_precision_recall_f1(self, ctx):
        result = compute_precision_recall_f1(ctx)
        assert scalar_names(result) == {"precision_macro", "recall_macro", "f1_macro"}
        per_label = result.tables()[0].payload
        assert len(per_label) == len(CLASSES)
        assert set(per_label["bagf_id"]) == set(CLASSES)
        # Perfect predictions -> all ones.
        perfect = make_val_results(accuracy=1.0)
        perfect_ctx = MetricsContext(
            val_results=perfect,
            ba_library=make_ba_library(),
            gf_library=make_gf_library(),
        )
        res2 = compute_precision_recall_f1(perfect_ctx)
        assert set(res2.scalars.values()) == {1.0}

    def test_balanced_accuracy_mcc(self, ctx):
        result = compute_balanced_accuracy_mcc(ctx)
        values = result.scalars
        assert 0.5 < values["balanced_accuracy"] <= 1.0
        assert 0.3 < values["mcc"] <= 1.0


class TestCalibration:
    def test_adaptive_ece_perfect(self):
        # Confidence == accuracy everywhere -> ECE ~ 0 under equal-mass bins.
        n = 2000
        rng = np.random.default_rng(0)
        conf = rng.uniform(0.5, 1.0, n)
        correct = rng.random(n) < conf
        gt = np.zeros(n, dtype=int)
        est = np.where(correct, 0, 1)
        ece, bins = adaptive_ece(conf, gt, est, n_bins=20)
        assert ece < 0.05
        assert sum(b["count"] for b in bins) == n

    def test_overconfident_has_high_ece(self):
        n = 1000
        conf = np.full(n, 0.95)
        gt = np.zeros(n, dtype=int)
        # Interleave correct/incorrect so every equal-mass bin is 50% right.
        est = (np.arange(n) % 2).astype(int)
        ece, _ = adaptive_ece(conf, gt, est)
        assert ece == pytest.approx(0.45, abs=0.01)

    def test_group_outputs(self, ctx):
        result = compute_calibration(ctx)
        assert "ece" in scalar_names(result)
        assert "calibration/per_bin_details" in artifact_paths(result)
        assert "calibration/reliability_diagram.png" in artifact_paths(result)
        assert "calibration/per_category_ece" in artifact_paths(result)


class TestTaxonomyHelpers:
    def test_lca_and_similarity(self):
        lib = make_ba_library()
        paths = build_ba_paths(
            ["ba-acro::", "ba-acro-tab::", "ba-porites::", "ba-algae::"], lib
        )
        assert find_lca("ba-acro", "ba-porites", paths) == "ba-hard"
        assert find_lca("ba-acro", "ba-algae", paths) is None
        assert taxonomic_similarity("ba-acro", "ba-acro", paths) == 1.0
        assert taxonomic_similarity("ba-acro", "ba-algae", paths) == 0.0
        sib = taxonomic_similarity("ba-acro", "ba-porites", paths)
        assert 0 < sib < 1


class TestTaxonomicGroup:
    def test_outputs(self, ctx):
        result = compute_taxonomic(ctx)
        names = scalar_names(result)
        assert {
            "cross_branch_error_rate",
            "within_branch_error_rate",
            "gf_accuracy_gf_relevant",
            "within_ba_gf_accuracy",
        } <= names
        values = result.scalars
        assert values["cross_branch_error_rate"] + values[
            "within_branch_error_rate"
        ] == pytest.approx(1.0)
        assert artifact_paths(result) >= {
            "taxonomic/error_attribution",
            "taxonomic/error_attribution.png",
            "taxonomic/top_level_confusion.png",
            "taxonomic/top_level_confusions",
            "taxonomic/gf_precision_recall_f1",
            "taxonomic/gf_confusion.png",
        }

    def test_no_errors_edge_case(self):
        perfect_ctx = MetricsContext(
            val_results=make_val_results(accuracy=1.0),
            ba_library=make_ba_library(),
            gf_library=make_gf_library(),
        )
        result = compute_taxonomic(perfect_ctx)
        values = result.scalars
        assert values["cross_branch_error_rate"] == 0.0


class TestRanking:
    def test_topk_and_mrr_exact(self):
        proba = np.array(
            [
                [0.7, 0.2, 0.1],  # gt=a -> rank 1
                [0.2, 0.7, 0.1],  # gt=a -> rank 2
                [0.1, 0.2, 0.7],  # gt=a -> rank 3
            ]
        )
        out = topk_and_mrr(proba, ["a", "a", "a"], ["a", "b", "c"])
        assert out["topk"][1] == pytest.approx(1 / 3)
        assert out["topk"][3] == 1.0
        assert out["mrr"] == pytest.approx((1 + 1 / 2 + 1 / 3) / 3)

    def test_group_outputs(self, ctx):
        rng = np.random.default_rng(1)
        n = len(ctx.val_results.gt)
        proba = rng.random((n, len(CLASSES)))
        proba /= proba.sum(axis=1, keepdims=True)
        ctx.val_proba = proba
        ctx.val_gt_labels = [CLASSES[i] for i in ctx.val_results.gt]

        class StubClf:
            classes_ = list(CLASSES)

        ctx.clf = StubClf()
        result = compute_ranking(ctx)
        names = scalar_names(result)
        assert {"top_1_accuracy", "top_3_accuracy", "mrr",
                "hierarchical_top_5_mean_similarity"} <= names
        # top-k accuracy at k = n_classes is always 1
        values = result.scalars
        assert values["top_10_accuracy"] == 1.0


class TestCoordinatorEndToEnd:
    def test_full_run_with_dataset(self, tmp_path, monkeypatch):
        """All 9 groups run and land in the tracker, using a real on-disk
        val label set so cover/per_source/probability/ranking engage."""
        from mermaid_classifier_tpu.data.features_io import write_feature_file
        from mermaid_classifier_tpu.data.labels import ImageLabels

        rng = np.random.default_rng(0)
        val = ImageLabels()
        feature_path_to_source = {}
        pts_per_img, dim = 20, 6
        for i in range(6):
            path = str(tmp_path / f"img{i}.features.npz")
            rowcols = np.stack(
                [np.arange(pts_per_img), np.arange(pts_per_img) * 2], 1
            ).astype(np.int32)
            feats = rng.normal(size=(pts_per_img, dim)).astype(np.float32)
            write_feature_file(path, rowcols, feats)
            labels = [
                (int(r), int(c), CLASSES[rng.integers(0, len(CLASSES))])
                for r, c in rowcols
            ]
            val.add_image(path, labels)
            feature_path_to_source[path] = ("coralnet", str(i % 2))

        class StubLabels:
            pass

        class StubDataset:
            pass

        dataset = StubDataset()
        dataset.labels = StubLabels()
        dataset.labels.val = val
        dataset.feature_path_to_source = feature_path_to_source

        # gt/est/scores aligned with sorted-key streaming order.
        gt, est, scores = [], [], []
        class_to_idx = {c: i for i, c in enumerate(CLASSES)}
        for key in sorted(val.data.keys()):
            for _, _, label in val.data[key]:
                g = class_to_idx[label]
                gt.append(g)
                est.append(g if rng.random() < 0.75 else int(rng.integers(0, 4)))
                scores.append(float(0.5 + 0.5 * rng.random()))
        val_results = ValResults(scores=scores, gt=gt, est=est, classes=list(CLASSES))

        class StubClf:
            classes_ = list(CLASSES)

            def predict_proba(self, x):
                out = rng.random((len(x), len(CLASSES)))
                return out / out.sum(axis=1, keepdims=True)

        ctx = MetricsContext(
            val_results=val_results,
            ba_library=make_ba_library(),
            gf_library=make_gf_library(),
            dataset=dataset,
            clf=StubClf(),
        )
        tracker = LocalTracker(tmp_path / "tracking")
        with tracker.start_run("metrics-test") as run:
            MetricsCoordinator(ctx, run).compute_and_log_all()

        metrics = run.latest_metrics()
        for expected in (
            "balanced_accuracy",
            "mcc",
            "f1_macro",
            "ece",
            "log_loss",
            "mrr",
            "cover_mean_rmse_pct",
            "per_source/min_accuracy",
            "cross_branch_error_rate",
            "top_1_accuracy",
        ):
            assert expected in metrics, f"missing {expected}: {sorted(metrics)}"
        artifacts = run.list_artifacts()
        assert any(a.startswith("confusion_matrix/") for a in artifacts)
        assert any(a.startswith("per_source/") for a in artifacts)
        assert any(a.startswith("cover/") for a in artifacts)
        # Per-group wall seconds are persisted so a slow metrics block in a
        # full-scale drive decomposes inside the tracked run.
        assert "metrics_group_seconds.json" in artifacts

    def test_precomputed_val_proba_is_honored(self, tmp_path):
        """A caller-precomputed probability matrix (the runner's
        resident-gather fast path) must be used as-is: the coordinator
        must NOT stream the val set through the classifier again."""
        from mermaid_classifier_tpu.data.features_io import write_feature_file
        from mermaid_classifier_tpu.data.labels import ImageLabels

        rng = np.random.default_rng(1)
        val = ImageLabels()
        pts, dim = 10, 4
        path = str(tmp_path / "img.features.npz")
        rowcols = np.stack([np.arange(pts), np.arange(pts)], 1).astype(np.int32)
        write_feature_file(
            path, rowcols, rng.normal(size=(pts, dim)).astype(np.float32)
        )
        val.add_image(
            path,
            [(int(r), int(c), CLASSES[0]) for r, c in rowcols],
        )

        class StubLabels:
            pass

        class StubDataset:
            pass

        dataset = StubDataset()
        dataset.labels = StubLabels()
        dataset.labels.val = val
        dataset.feature_path_to_source = {path: ("coralnet", "0")}

        gt = [0] * pts
        val_results = ValResults(
            scores=[0.9] * pts, gt=gt, est=gt, classes=list(CLASSES)
        )

        class BoomClf:
            classes_ = list(CLASSES)

            def predict_proba(self, x):
                raise AssertionError(
                    "coordinator re-streamed the val set despite a"
                    " precomputed matrix"
                )

        preset = np.full((pts, len(CLASSES)), 1.0 / len(CLASSES))
        ctx = MetricsContext(
            val_results=val_results,
            ba_library=make_ba_library(),
            gf_library=make_gf_library(),
            dataset=dataset,
            clf=BoomClf(),
            val_proba=preset,
            val_gt_labels=[CLASSES[0]] * pts,
        )
        tracker = LocalTracker(tmp_path / "tracking")
        with tracker.start_run("preset-proba") as run:
            MetricsCoordinator(ctx, run).compute_and_log_all()
        metrics = run.latest_metrics()
        assert "log_loss" in metrics  # proba-dependent group ran off the preset

    def test_group_seconds_write_failure_is_isolated(self):
        """The timing-artifact write obeys the same isolation as every
        other tracker write: a failing log_dict must not abort a metrics
        stage whose groups already computed."""
        n = 20
        gt = [i % len(CLASSES) for i in range(n)]
        val_results = ValResults(
            scores=[0.9] * n, gt=gt, est=gt, classes=list(CLASSES)
        )
        ctx = MetricsContext(
            val_results=val_results,
            ba_library=make_ba_library(),
            gf_library=make_gf_library(),
        )

        class ExplodingDictRun:
            def log_metric(self, *a, **k):
                pass

            def log_dataframe(self, *a, **k):
                pass

            def log_figure(self, *a, **k):
                pass

            def log_dict(self, *a, **k):
                raise OSError("disk full")

        coordinator = MetricsCoordinator(ctx, ExplodingDictRun())
        coordinator.compute_and_log_all()  # must not raise
        assert coordinator.group_seconds  # groups ran and were timed

    def test_per_source_misalignment_raises(self, tmp_path):
        """The alignment invariant fires instead of silently mis-grouping."""
        from mermaid_classifier_tpu.data.labels import ImageLabels
        from mermaid_classifier_tpu.metrics.per_source import compute_per_source

        val = ImageLabels()
        val.data["/fake/path.npz"] = [(0, 0, CLASSES[0])] * 5

        class StubLabels:
            pass

        class StubDataset:
            pass

        dataset = StubDataset()
        dataset.labels = StubLabels()
        dataset.labels.val = val
        dataset.feature_path_to_source = {"/fake/path.npz": ("coralnet", "1")}

        vr = make_val_results(n=3)  # 3 != 5 points
        ctx = MetricsContext(
            val_results=vr,
            ba_library=make_ba_library(),
            gf_library=make_gf_library(),
            dataset=dataset,
        )
        with pytest.raises(ValueError, match="does not match"):
            compute_per_source(ctx)
