"""Packed-feature-cache tests: native/numpy differential, error paths,
writer round trip (the native analog of the house parity-test style,
SURVEY.md §4 category 2)."""

import numpy as np
import pytest

from mermaid_classifier_tpu.data.features_io import write_feature_file
from mermaid_classifier_tpu.native.fastbatch import (
    PackedFeatureCache,
    PackedFeatureCacheWriter,
    native_available,
    pack_feature_files,
)

DIM = 32


@pytest.fixture()
def cache_dir(tmp_path):
    rng = np.random.default_rng(0)
    writer = PackedFeatureCacheWriter(tmp_path / "cache", DIM)
    for image_id, n_points in (("img-a", 3), ("img-b", 5), ("img-c", 2)):
        feats = rng.standard_normal((n_points, DIM)).astype(np.float32)
        writer.add_image(image_id, feats, [f"lab-{i % 2}" for i in range(n_points)])
    writer.finalize()
    return tmp_path / "cache"


class TestWriter:
    def test_round_trip(self, cache_dir):
        cache = PackedFeatureCache(cache_dir, use_native=False)
        assert cache.rows == 10
        assert cache.dim == DIM
        assert cache.images["img-b"] == (3, 5)
        assert len(cache.labels) == 10

    def test_duplicate_image_rejected(self, tmp_path):
        writer = PackedFeatureCacheWriter(tmp_path / "c", DIM)
        feats = np.zeros((1, DIM), np.float32)
        writer.add_image("x", feats, ["a"])
        with pytest.raises(ValueError, match="already added"):
            writer.add_image("x", feats, ["a"])
        writer.abort()

    def test_shape_validation(self, tmp_path):
        writer = PackedFeatureCacheWriter(tmp_path / "c", DIM)
        with pytest.raises(ValueError, match="must be"):
            writer.add_image("x", np.zeros((1, DIM + 1), np.float32), ["a"])
        with pytest.raises(ValueError, match="labels"):
            writer.add_image("x", np.zeros((2, DIM), np.float32), ["a"])
        writer.abort()

    def test_pack_from_feature_files(self, tmp_path):
        rng = np.random.default_rng(1)
        items = []
        for i in range(3):
            path = tmp_path / f"i{i}.features.npz"
            rowcols = np.array([[1, 2], [3, 4]], np.int32)
            feats = rng.standard_normal((2, DIM)).astype(np.float32)
            write_feature_file(path, rowcols, feats)
            items.append((f"img-{i}", path, ["x", "y"]))
        cache = pack_feature_files(tmp_path / "cache", items, DIM)
        assert cache.rows == 6
        rows = cache.gather(cache.image_rows("img-2"))
        _, expected = (
            np.load(items[2][1], allow_pickle=False)["rowcols"],
            np.load(items[2][1], allow_pickle=False)["features"],
        )
        np.testing.assert_array_equal(rows, expected)


class TestGather:
    def test_numpy_gather(self, cache_dir):
        cache = PackedFeatureCache(cache_dir, use_native=False)
        idx = np.array([9, 0, 4, 4, 7], np.int64)
        out = cache.gather(idx)
        mm = np.memmap(cache_dir / "features.bin", dtype=np.float32,
                       shape=(10, DIM))
        np.testing.assert_array_equal(out, mm[idx])

    def test_out_of_range(self, cache_dir):
        cache = PackedFeatureCache(cache_dir, use_native=False)
        with pytest.raises(IndexError):
            cache.gather(np.array([10], np.int64))
        with pytest.raises(IndexError):
            cache.gather(np.array([-1], np.int64))

    def test_labels_at(self, cache_dir):
        cache = PackedFeatureCache(cache_dir, use_native=False)
        assert cache.labels_at(np.array([0, 1], np.int64)) == ["lab-0", "lab-1"]


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
class TestNativeGather:
    def test_native_matches_numpy(self, cache_dir):
        native = PackedFeatureCache(cache_dir, use_native=True)
        fallback = PackedFeatureCache(cache_dir, use_native=False)
        assert native.use_native
        rng = np.random.default_rng(2)
        for n in (1, 7, 64, 1000):
            idx = rng.integers(0, 10, size=n).astype(np.int64)
            np.testing.assert_array_equal(
                native.gather(idx, n_threads=4), fallback.gather(idx)
            )
        native.close()

    def test_native_out_of_range(self, cache_dir):
        native = PackedFeatureCache(cache_dir, use_native=True)
        with pytest.raises(IndexError, match="out of range"):
            native.gather(np.array([3, 99], np.int64))
        native.close()

    def test_large_differential(self, tmp_path):
        rng = np.random.default_rng(3)
        writer = PackedFeatureCacheWriter(tmp_path / "big", 128)
        for i in range(50):
            n = int(rng.integers(1, 30))
            writer.add_image(
                f"i{i}",
                rng.standard_normal((n, 128)).astype(np.float32),
                ["l"] * n,
            )
        writer.finalize()
        native = PackedFeatureCache(tmp_path / "big", use_native=True)
        fallback = PackedFeatureCache(tmp_path / "big", use_native=False)
        idx = rng.permutation(native.rows).astype(np.int64)
        np.testing.assert_array_equal(
            native.gather(idx, n_threads=8), fallback.gather(idx)
        )
        native.close()


class TestCorruption:
    def test_truncated_data_file_rejected(self, cache_dir):
        data = (cache_dir / "features.bin").read_bytes()
        (cache_dir / "features.bin").write_bytes(data[:-8])
        with pytest.raises(ValueError, match="declares"):
            PackedFeatureCache(cache_dir, use_native=False)
