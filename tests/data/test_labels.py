"""Tests for feature-file IO, ImageLabels streaming, and the stratified
per-point split."""

import numpy as np
import pytest

from mermaid_classifier_tpu.data.features_io import (
    read_feature_file,
    read_legacy_featurevector_json,
    select_point_features,
    write_feature_file,
)
from mermaid_classifier_tpu.data.labels import (
    ImageLabels,
    SplitMode,
    preprocess_labels,
)


def build_synthetic_labels(tmp_path, n_images=20, pts_per_image=10, n_classes=4,
                           dim=8, seed=0):
    """Write per-image feature files and the matching ImageLabels."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 3, size=(n_classes, dim)).astype(np.float32)
    class_names = [f"BA{k}::GF{k}" for k in range(n_classes)]
    labels = ImageLabels()
    for i in range(n_images):
        rowcols = np.stack(
            [np.arange(pts_per_image) * 7 + 5, np.arange(pts_per_image) * 11 + 3],
            axis=1,
        ).astype(np.int32)
        y_idx = rng.integers(0, n_classes, pts_per_image)
        feats = centers[y_idx] + rng.normal(0, 0.5, size=(pts_per_image, dim)).astype(
            np.float32
        )
        path = str(tmp_path / f"img_{i:03d}.features.npz")
        write_feature_file(path, rowcols, feats)
        labels.add_image(
            path,
            [
                (int(r), int(c), class_names[k])
                for (r, c), k in zip(rowcols, y_idx)
            ],
        )
    return labels, class_names


class TestFeatureIO:
    def test_roundtrip(self, tmp_path):
        rowcols = np.array([[1, 2], [3, 4]], dtype=np.int32)
        feats = np.arange(8, dtype=np.float32).reshape(2, 4)
        path = tmp_path / "a.features.npz"
        write_feature_file(path, rowcols, feats)
        r2, f2 = read_feature_file(path)
        np.testing.assert_array_equal(r2, rowcols)
        np.testing.assert_array_equal(f2, feats)
        # No leftover temp files (atomic write).
        assert list(tmp_path.glob("*.part")) == []

    def test_shape_validation(self, tmp_path):
        with pytest.raises(ValueError, match="rowcols"):
            write_feature_file(tmp_path / "x.npz", np.zeros((2, 3)), np.zeros((2, 4)))
        with pytest.raises(ValueError, match="features"):
            write_feature_file(tmp_path / "x.npz", np.zeros((2, 2)), np.zeros((3, 4)))

    def test_select_point_features(self):
        rowcols = np.array([[10, 20], [30, 40], [50, 60]], dtype=np.int32)
        feats = np.arange(9, dtype=np.float32).reshape(3, 3)
        out = select_point_features(rowcols, feats, [(50, 60), (10, 20)])
        np.testing.assert_array_equal(out, feats[[2, 0]])
        with pytest.raises(KeyError, match="not present"):
            select_point_features(rowcols, feats, [(1, 1)])

    def test_mapped_reader_matches_eager(self, tmp_path):
        """read_feature_file_mapped must return exactly read_feature_file's
        arrays (it feeds the resident fill, where a header-parse slip would
        silently train on shifted bytes)."""
        from mermaid_classifier_tpu.data.features_io import (
            read_feature_file_mapped,
        )

        rng = np.random.default_rng(3)
        rowcols = np.stack(
            [rng.integers(0, 3000, 17), rng.integers(0, 3000, 17)], axis=1
        ).astype(np.int32)
        feats = rng.standard_normal((17, 31)).astype(np.float32)
        path = tmp_path / "m.features.npz"
        write_feature_file(path, rowcols, feats)

        r_eager, f_eager = read_feature_file(path)
        r_map, f_map = read_feature_file_mapped(path)
        np.testing.assert_array_equal(r_map, r_eager)
        np.testing.assert_array_equal(np.asarray(f_map), f_eager)
        # The fast path really mapped (no copy) rather than falling back.
        assert isinstance(f_map, np.memmap)

    def test_mapped_reader_falls_back_on_compressed(self, tmp_path):
        """A compressed npz (np.savez_compressed) can't be mapped; the
        reader must fall back to the eager path with identical results."""
        from mermaid_classifier_tpu.data.features_io import (
            read_feature_file_mapped,
        )

        rowcols = np.array([[1, 2], [3, 4]], dtype=np.int32)
        feats = np.arange(8, dtype=np.float32).reshape(2, 4)
        path = tmp_path / "c.features.npz"
        np.savez_compressed(path, rowcols=rowcols, features=feats)
        r, f = read_feature_file_mapped(path)
        np.testing.assert_array_equal(r, rowcols)
        np.testing.assert_array_equal(f, feats)
        assert not isinstance(f, np.memmap)

    def test_mapped_reader_parses_npy_v2_v3_headers(self, tmp_path):
        """np.savez writes v1 headers today, but the parser claims v2/v3
        support (4-byte header length) — pin it against members written
        with those versions explicitly."""
        import io
        import zipfile

        from mermaid_classifier_tpu.data.features_io import (
            read_feature_file_mapped,
        )

        feats = np.arange(12, dtype=np.float32).reshape(3, 4)
        rowcols = np.stack(
            [np.arange(3), np.arange(3) + 10], axis=1
        ).astype(np.int32)
        path = tmp_path / "v23.npz"
        with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
            b = io.BytesIO()
            np.lib.format.write_array(b, rowcols, version=(2, 0))
            zf.writestr("rowcols.npy", b.getvalue())
            b = io.BytesIO()
            np.lib.format.write_array(b, feats, version=(3, 0))
            zf.writestr("features.npy", b.getvalue())
        r, f = read_feature_file_mapped(path)
        assert isinstance(f, np.memmap)  # mapped, not the eager fallback
        np.testing.assert_array_equal(r, rowcols)
        np.testing.assert_array_equal(np.asarray(f), feats)

    def test_select_point_rows(self):
        from mermaid_classifier_tpu.data.features_io import select_point_rows

        rowcols = np.array([[10, 20], [30, 40], [50, 60]], dtype=np.int32)
        # Exact match in stored order → None (no-gather fast path).
        assert select_point_rows(rowcols, [(10, 20), (30, 40), (50, 60)]) is None
        # Subset + reorder.
        np.testing.assert_array_equal(
            select_point_rows(rowcols, [(50, 60), (10, 20)]), [2, 0]
        )
        # Missing point raises (first missing in wanted order).
        with pytest.raises(KeyError, match=r"point \(1, 1\) not present"):
            select_point_rows(rowcols, [(30, 40), (1, 1)])
        # Duplicate stored point resolves to its LAST occurrence (the dict
        # semantics select_point_features always had).
        dup = np.array([[5, 5], [7, 7], [5, 5]], dtype=np.int32)
        np.testing.assert_array_equal(
            select_point_rows(dup, [(5, 5), (7, 7)]), [2, 1]
        )
        # Empty wanted list → empty index array, not None.
        got = select_point_rows(rowcols, [])
        assert got is not None and got.shape == (0,)
        # A duplicated stored point defeats the exact-match fast path too:
        # dict-last semantics map EVERY (5,5) lookup to the last
        # occurrence, which identity order would not reproduce.
        np.testing.assert_array_equal(
            select_point_rows(dup, [(5, 5), (7, 7), (5, 5)]), [2, 1, 2]
        )

    def test_mapped_member_rejects_truncated_magic(self, tmp_path):
        """A STORED member whose bytes end inside the npy magic must make
        the mapped parser bail to the eager path (None), not crash with
        an IndexError."""
        import zipfile

        from mermaid_classifier_tpu.data.features_io import (
            _mapped_npz_member,
        )

        path = tmp_path / "trunc.npz"
        with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
            zf.writestr("features.npy", b"\x93NUMPY")  # magic cut at 6 bytes
        with zipfile.ZipFile(path) as zf:
            assert _mapped_npz_member(path, zf, "features.npy") is None

    def test_legacy_json_reader(self, tmp_path):
        import json

        payload = {
            "point_features": [
                {"row": 5, "col": 9, "data": [0.1, 0.2]},
                {"row": 7, "col": 3, "data": [0.3, 0.4]},
            ]
        }
        p = tmp_path / "legacy.featurevector"
        p.write_text(json.dumps(payload))
        rowcols, feats = read_legacy_featurevector_json(p)
        np.testing.assert_array_equal(rowcols, [[5, 9], [7, 3]])
        np.testing.assert_allclose(feats, [[0.1, 0.2], [0.3, 0.4]], rtol=1e-6)


class TestImageLabels:
    def test_bookkeeping(self, tmp_path):
        labels, class_names = build_synthetic_labels(tmp_path, n_images=5)
        assert len(labels) == 5
        assert labels.label_count == 50
        assert labels.classes_set <= set(class_names)
        with pytest.raises(ValueError, match="already added"):
            labels.add_image(labels.image_keys[0], [])

    def test_load_data_in_batches(self, tmp_path):
        labels, _ = build_synthetic_labels(tmp_path, n_images=10, pts_per_image=10)
        batches = list(labels.load_data_in_batches(batch_size=25))
        total = sum(len(y) for _, y in batches)
        assert total == 100
        # every batch except maybe the last reaches the threshold
        for x, y in batches[:-1]:
            assert len(y) >= 25
            assert x.shape[0] == len(y)

    def test_batch_order_seeded(self, tmp_path):
        labels, _ = build_synthetic_labels(tmp_path, n_images=10)
        a1 = np.vstack([x for x, _ in labels.load_data_in_batches(30, random_seed=1)])
        a2 = np.vstack([x for x, _ in labels.load_data_in_batches(30, random_seed=1)])
        b = np.vstack([x for x, _ in labels.load_data_in_batches(30, random_seed=2)])
        np.testing.assert_array_equal(a1, a2)
        assert not np.array_equal(a1, b)

    def test_features_align_with_labels(self, tmp_path):
        labels, _ = build_synthetic_labels(tmp_path, n_images=3, dim=4)
        x, y = labels.load_all()
        assert x.shape == (30, 4)
        assert len(y) == 30


class TestPreprocessLabels:
    def test_split_ratios_and_determinism(self, tmp_path):
        labels, _ = build_synthetic_labels(
            tmp_path, n_images=50, pts_per_image=20, n_classes=4
        )
        t1 = preprocess_labels(labels, split_ratios=(0.1, 0.1))
        t2 = preprocess_labels(labels, split_ratios=(0.1, 0.1))
        assert t1.train.data == t2.train.data
        assert t1.ref.data == t2.ref.data
        assert t1.val.data == t2.val.data

        total = labels.label_count
        assert t1.label_count == total
        assert t1.ref.label_count == pytest.approx(0.1 * total, rel=0.15)
        assert t1.val.label_count == pytest.approx(0.1 * total, rel=0.15)
        assert t1.train.label_count > 0.7 * total

    def test_stratified_per_class(self, tmp_path):
        labels, class_names = build_synthetic_labels(
            tmp_path, n_images=60, pts_per_image=20, n_classes=3
        )
        triple = preprocess_labels(labels, split_ratios=(0.2, 0.2))

        def per_class_counts(img_labels):
            counts = dict.fromkeys(class_names, 0)
            for anns in img_labels.data.values():
                for _, _, lab in anns:
                    counts[lab] += 1
            return counts

        total_counts = per_class_counts(labels)
        ref_counts = per_class_counts(triple.ref)
        val_counts = per_class_counts(triple.val)
        for c in class_names:
            if total_counts[c] == 0:
                continue
            assert ref_counts[c] == pytest.approx(0.2 * total_counts[c], abs=2, rel=0.2)
            assert val_counts[c] == pytest.approx(0.2 * total_counts[c], abs=2, rel=0.2)

    def test_tiny_class_keeps_train_point(self, tmp_path):
        # A class with a single point must land in train, not ref/val.
        rowcols = np.array([[1, 1], [2, 2], [3, 3]], dtype=np.int32)
        feats = np.zeros((3, 4), dtype=np.float32)
        path = str(tmp_path / "only.features.npz")
        write_feature_file(path, rowcols, feats)
        labels = ImageLabels()
        labels.add_image(
            path, [(1, 1, "rare"), (2, 2, "common"), (3, 3, "common")]
        )
        triple = preprocess_labels(labels, split_ratios=(0.4, 0.4))
        assert "rare" in triple.train.classes_set
        assert "rare" not in triple.ref.classes_set
        assert "rare" not in triple.val.classes_set

    def test_invalid_ratios(self, tmp_path):
        labels, _ = build_synthetic_labels(tmp_path, n_images=2)
        with pytest.raises(ValueError, match="split_ratios"):
            preprocess_labels(labels, split_ratios=(0.6, 0.5))
        with pytest.raises(ValueError, match="Unsupported split mode"):
            preprocess_labels(labels, split_mode="bogus")

    def test_split_independent_of_insertion_order(self, tmp_path):
        labels, _ = build_synthetic_labels(tmp_path, n_images=10)
        reordered = ImageLabels()
        for key in reversed(labels.image_keys):
            reordered.add_image(key, labels.data[key])
        t1 = preprocess_labels(labels)
        t2 = preprocess_labels(reordered)
        assert t1.train.data == t2.train.data
        assert t1.val.data == t2.val.data
        assert SplitMode.POINTS_STRATIFIED.value == "points_stratified"


class TestPackedCacheDifferential:
    """Packed-cache batch streaming must be byte-identical to the
    file-backed path (SURVEY.md §4 differential-test style)."""

    def _labels_with_files(self, tmp_path):
        import numpy as np

        from mermaid_classifier_tpu.data.features_io import write_feature_file

        rng = np.random.default_rng(0)
        labels = ImageLabels()
        for i in range(6):
            path = str(tmp_path / f"i{i}.features.npz")
            n = int(rng.integers(1, 5))
            rowcols = np.stack(
                [np.arange(n), np.arange(n) + 10], axis=1
            ).astype(np.int32)
            feats = rng.standard_normal((n, 8)).astype(np.float32)
            write_feature_file(path, rowcols, feats)
            labels.add_image(
                path, [(int(r), int(c), f"lab-{i % 3}") for r, c in rowcols]
            )
        return labels

    def test_batches_identical(self, tmp_path):
        import numpy as np

        plain = self._labels_with_files(tmp_path)
        packed = self._labels_with_files(tmp_path / "dup")
        packed.build_packed_cache(tmp_path / "cache")
        assert packed.packed_cache is not None

        for seed in (None, 0, 7):
            got = list(packed.load_data_in_batches(4, random_seed=seed))
            want = list(plain.load_data_in_batches(4, random_seed=seed))
            assert len(got) == len(want)
            for (gx, gy), (wx, wy) in zip(got, want):
                # Keys differ (dup dir) but shapes/values align because the
                # per-image content is identical and ordering is seed-driven
                # over sorted keys of equal cardinality.
                assert gx.shape == wx.shape
                assert gy == wy

    def test_same_instance_before_after_packing(self, tmp_path):
        labels = self._labels_with_files(tmp_path)
        before = list(labels.load_data_in_batches(4, random_seed=3))
        labels.build_packed_cache(tmp_path / "cache")
        after = list(labels.load_data_in_batches(4, random_seed=3))
        assert len(before) == len(after)
        for (bx, by), (ax, ay) in zip(before, after):
            import numpy as np

            np.testing.assert_array_equal(bx, ax)
            assert by == ay

    def test_load_all_matches(self, tmp_path):
        import numpy as np

        labels = self._labels_with_files(tmp_path)
        x1, y1 = labels.load_all()
        labels.build_packed_cache(tmp_path / "cache")
        x2, y2 = labels.load_all()
        np.testing.assert_array_equal(x1, x2)
        assert y1 == y2


class TestIndexBatches:
    """iter_index_batches must be the exact index twin of
    load_data_in_batches: same batch boundaries, labels, and — through
    load_all's canonical layout — the same feature rows."""

    def test_twin_of_data_batches(self, tmp_path):
        labels, _ = build_synthetic_labels(
            tmp_path, n_images=12, pts_per_image=7, n_classes=3, dim=6, seed=2
        )
        x_all, y_all = labels.load_all()
        for seed in (None, 0, 3):
            data_batches = list(
                labels.load_data_in_batches(batch_size=20, random_seed=seed)
            )
            idx_batches = list(
                labels.iter_index_batches(batch_size=20, random_seed=seed)
            )
            assert len(data_batches) == len(idx_batches)
            for (x, y), (idx, y2) in zip(data_batches, idx_batches):
                assert y == y2
                np.testing.assert_array_equal(x, x_all[idx])

    def test_row_ranges_cover_canonical_layout(self, tmp_path):
        labels, _ = build_synthetic_labels(
            tmp_path, n_images=5, pts_per_image=4, n_classes=2, dim=4, seed=0
        )
        ranges = labels.row_ranges()
        offset = 0
        for key in sorted(labels.data.keys()):
            assert ranges[key] == (offset, len(labels.data[key]))
            offset += len(labels.data[key])
        assert offset == labels.label_count


class TestLoadInto:
    """load_into must fill the caller's buffer with exactly load_all's rows
    (canonical layout), serial or parallel — it feeds the device-resident
    upload, where a row landing at the wrong offset silently trains on the
    wrong features."""

    def test_matches_load_all_serial_and_parallel(self, tmp_path):
        labels, _ = build_synthetic_labels(tmp_path, n_images=13,
                                           pts_per_image=7)
        want, _ = labels.load_all()
        n, dim = want.shape
        for workers in (None, 1, 4):
            out = np.full((n + 5, dim), np.nan, dtype=np.float32)
            labels.load_into(out, offset=5, max_workers=workers)
            np.testing.assert_array_equal(out[5:], want)
            assert np.isnan(out[:5]).all()  # rows before offset untouched

    def test_subset_annotations_gather_correct_rows(self, tmp_path):
        """Annotations that are a reordered strict subset of the file's
        points (every post-split ImageLabels) must land exactly
        select_point_features' rows — this drives the direct np.take-into-
        destination path."""
        from mermaid_classifier_tpu.data.features_io import write_feature_file

        rng = np.random.default_rng(5)
        labels = ImageLabels()
        for i in range(4):
            n = 9
            rowcols = np.stack(
                [np.arange(n) * 3 + 1, np.arange(n) * 5 + 2], axis=1
            ).astype(np.int32)
            feats = rng.standard_normal((n, 6)).astype(np.float32)
            path = str(tmp_path / f"s{i}.features.npz")
            write_feature_file(path, rowcols, feats)
            picked = rng.permutation(n)[: n - 3]
            labels.add_image(
                path,
                [(int(rowcols[j, 0]), int(rowcols[j, 1]), "L") for j in picked],
            )
        want, _ = labels.load_all()
        for workers in (None, 4):
            out = np.empty(want.shape, dtype=np.float32)
            labels.load_into(out, max_workers=workers)
            np.testing.assert_array_equal(out, want)

    def test_reduced_storage_dtype_casts(self, tmp_path):
        """A bf16 destination buffer must hold exactly the f32 rows cast to
        bf16 (the reduced-precision staging path goes through the per-thread
        scratch)."""
        import jax.numpy as jnp

        labels, _ = build_synthetic_labels(tmp_path, n_images=6,
                                           pts_per_image=5)
        want, _ = labels.load_all()
        for workers in (None, 4):
            out = np.empty(want.shape, dtype=jnp.bfloat16)
            labels.load_into(out, max_workers=workers)
            np.testing.assert_array_equal(
                out.view(np.uint16),
                want.astype(jnp.bfloat16).view(np.uint16),
            )

    def test_on_rows_filled_covers_every_row_exactly_once(self, tmp_path):
        """The fill-progress callback must report each image's absolute
        span after its rows are written — the pipelined upload trusts it
        to decide which slabs are safe to read."""
        import threading

        labels, _ = build_synthetic_labels(tmp_path, n_images=9,
                                           pts_per_image=5)
        want, _ = labels.load_all()
        for workers in (None, 4):
            spans = []
            lock = threading.Lock()
            out = np.empty((want.shape[0] + 2, want.shape[1]), np.float32)

            def record(start, n):
                # Rows must already be final when the callback fires.
                np.testing.assert_array_equal(
                    out[start: start + n], want[start - 2: start - 2 + n]
                )
                with lock:
                    spans.append((start, n))

            labels.load_into(out, offset=2, max_workers=workers,
                             on_rows_filled=record)
            covered = sorted(spans)
            assert covered[0][0] == 2
            assert sum(n for _, n in covered) == want.shape[0]
            for (a, n1), (b, _) in zip(covered, covered[1:]):
                assert a + n1 == b  # disjoint, gapless

    def test_rejects_undersized_buffer(self, tmp_path):
        labels, _ = build_synthetic_labels(tmp_path, n_images=3,
                                           pts_per_image=4)
        out = np.empty((labels.label_count - 1, 8), dtype=np.float32)
        with pytest.raises(ValueError, match="cannot hold"):
            labels.load_into(out)

    def test_parallel_read_failure_propagates(self, tmp_path):
        import os

        labels, _ = build_synthetic_labels(tmp_path, n_images=6,
                                           pts_per_image=4)
        victim = sorted(labels.data.keys())[3]
        os.remove(victim)
        out = np.empty((labels.label_count, 8), dtype=np.float32)
        with pytest.raises(FileNotFoundError):
            labels.load_into(out, max_workers=4)
