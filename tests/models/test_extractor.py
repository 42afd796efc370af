"""FeatureExtractor tests: end-to-end patch->feature path, static-shape
bucketing, point validation, device-numerics self-check."""

import numpy as np
import pytest

from mermaid_classifier_tpu.models.extractor import build_extractor
from tests.models.test_efficientnet import TINY


@pytest.fixture(scope="module")
def extractor():
    # XLA gather path on the CPU test backend; Pallas equivalence is pinned
    # separately in test_patch_ops.py.
    return build_extractor(
        config=TINY, backbone_batch=8, point_bucket=4, image_bucket=64,
        use_pallas=False,
    )


class TestExtractFeatures:
    def test_shapes_and_determinism(self, extractor):
        rng = np.random.default_rng(0)
        image = rng.integers(0, 256, size=(100, 140, 3), dtype=np.uint8)
        rowcols = np.array([[10, 10], [50, 70], [99, 139], [0, 0], [30, 100]])
        f1 = extractor.extract_features(image, rowcols)
        f2 = extractor.extract_features(image, rowcols)
        assert f1.shape == (5, TINY.feature_dim)
        np.testing.assert_array_equal(f1, f2)

    def test_point_padding_does_not_leak(self, extractor):
        """Features must be identical whether a point set needs padding to
        the bucket or not."""
        rng = np.random.default_rng(1)
        image = rng.integers(0, 256, size=(80, 80, 3), dtype=np.uint8)
        pts5 = np.array([[10, 10], [20, 30], [40, 40], [60, 20], [70, 70]])
        f_all = extractor.extract_features(image, pts5)  # padded 5 -> 8
        f_first4 = extractor.extract_features(image, pts5[:4])  # exact bucket
        np.testing.assert_allclose(f_all[:4], f_first4, atol=1e-5)

    def test_image_bucketing_invariance(self, extractor):
        """The same image content must yield the same features regardless of
        which size bucket the image lands in (bottom/right zero pad only)."""
        rng = np.random.default_rng(2)
        small = rng.integers(0, 256, size=(60, 60, 3), dtype=np.uint8)
        # Embed in a larger canvas of zeros: identical crops for interior
        # points far from the new padding.
        big = np.zeros((100, 100, 3), np.uint8)
        big[:60, :60] = small
        pts = np.array([[30, 30], [20, 40]])
        f_small = extractor.extract_features(small, pts)
        f_big = extractor.extract_features(big, pts)
        np.testing.assert_allclose(f_small, f_big, atol=1e-5)

    def test_out_of_bounds_point_rejected(self, extractor):
        image = np.zeros((50, 50, 3), np.uint8)
        with pytest.raises(ValueError, match="outside the image"):
            extractor.extract_features(image, np.array([[50, 10]]))
        with pytest.raises(ValueError, match="outside the image"):
            extractor.extract_features(image, np.array([[-1, 10]]))

    def test_empty_points(self, extractor):
        image = np.zeros((50, 50, 3), np.uint8)
        out = extractor.extract_features(image, np.zeros((0, 2), np.int32))
        assert out.shape == (0, TINY.feature_dim)

    def test_seeded_weights_reproducible(self):
        e1 = build_extractor(config=TINY, seed=7, use_pallas=False)
        e2 = build_extractor(config=TINY, seed=7, use_pallas=False)
        image = np.full((40, 40, 3), 128, np.uint8)
        pts = np.array([[20, 20]])
        np.testing.assert_array_equal(
            e1.extract_features(image, pts), e2.extract_features(image, pts)
        )


class TestBackboneImpl:
    """The folded/fused backbone implementations are drop-in: same
    features as the flax forward (fused kernels run interpreted on the
    CPU test backend; compiled equivalence is the on-chip gate's job)."""

    @pytest.mark.parametrize("impl", ["folded", "fused"])
    def test_matches_flax(self, extractor, impl):
        alt = build_extractor(
            config=TINY, seed=0, backbone_batch=8, point_bucket=4,
            image_bucket=64, backbone_impl=impl,
        )
        rng = np.random.default_rng(11)
        image = rng.integers(0, 256, size=(40, 48, 3), dtype=np.uint8)
        rowcols = np.array([[5, 5], [20, 30], [39, 47]], np.int32)
        ref = extractor.extract_features(image, rowcols)
        got = alt.extract_features(image, rowcols)
        rel = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-12)
        assert rel < 1e-4, (impl, rel)

    def test_numerics_gate_covers_configured_impl(self):
        alt = build_extractor(
            config=TINY, seed=0, backbone_batch=8, backbone_impl="fused"
        )
        assert alt.verify_device_numerics(n_patches=2) > 0.999

    def test_numerics_gate_without_cpu_backend(self, monkeypatch):
        """TPU plugins that register ONLY their own backend (axon) expose
        no in-process CPU device; the gate must fall back to a same-device
        float32 reference instead of crashing the production CLI
        (regression: the first at-scale bucket drive died here)."""
        import jax

        real_devices = jax.devices

        def no_cpu(backend=None):
            if backend == "cpu":
                raise RuntimeError(
                    "Unknown backend cpu. Available backends are ['axon']"
                )
            return real_devices() if backend is None else real_devices(backend)

        monkeypatch.setattr(jax, "devices", no_cpu)
        ext = build_extractor(config=TINY, seed=0, backbone_batch=8)
        assert ext.verify_device_numerics(n_patches=2) > 0.999

    def test_rejects_unknown_impl(self):
        with pytest.raises(ValueError, match="backbone_impl"):
            build_extractor(config=TINY, backbone_impl="turbo")

    def test_rejects_mesh_with_fused(self):
        import jax

        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
        with pytest.raises(ValueError, match="single-device"):
            build_extractor(
                config=TINY, backbone_batch=8, backbone_impl="fused",
                mesh=mesh,
            )


class TestGeometrySweep:
    """Property-style sweep: arbitrary image sizes (odd/even, smaller and
    larger than the patch), point counts across bucket boundaries, and
    corner/edge points must all produce finite features identical to an
    independently-built extractor — no geometry drift from bucketing,
    padding, or the folded schedule."""

    def test_random_geometries_are_stable(self):
        rng = np.random.default_rng(42)
        a = build_extractor(
            config=TINY, seed=3, backbone_batch=8, point_bucket=4,
            image_bucket=64,
        )
        b = build_extractor(
            config=TINY, seed=3, backbone_batch=16, point_bucket=8,
            image_bucket=32,
        )
        for h, w, n_points in [
            (31, 47, 1),   # smaller than the 32^2 patch, odd dims
            (33, 70, 5),   # straddles the patch size
            (95, 129, 9),  # crosses both image buckets
            (64, 64, 4),   # exactly bucket-aligned
        ]:
            image = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rowcols = np.stack(
                [rng.integers(0, h, n_points), rng.integers(0, w, n_points)],
                axis=1,
            ).astype(np.int32)
            rowcols[0] = (0, 0)  # always include the worst corner
            fa = a.extract_features(image, rowcols)
            fb = b.extract_features(image, rowcols)
            assert fa.shape == (n_points, TINY.feature_dim)
            assert np.isfinite(fa).all(), (h, w)
            # Bucketing knobs must not change the numbers.
            rel = np.abs(fa - fb).max() / max(np.abs(fa).max(), 1e-12)
            assert rel < 1e-5, (h, w, n_points, rel)


class TestDeviceNumerics:
    def test_self_check_passes_on_cpu(self, extractor):
        worst = extractor.verify_device_numerics(n_patches=4)
        assert worst >= 0.999

    def test_self_check_gate_fires(self, extractor, monkeypatch):
        from mermaid_classifier_tpu.models.extractor import DeviceNumericsError

        with pytest.raises(DeviceNumericsError, match="min cosine"):
            extractor.verify_device_numerics(n_patches=4, min_cosine=1.1)


class TestMeshExtractor:
    """Mesh-sharded extraction must equal single-device extraction."""

    def test_matches_single_device(self, tmp_path):
        import numpy as np

        from mermaid_classifier_tpu.models.extractor import build_extractor
        from mermaid_classifier_tpu.parallel.mesh import make_mesh

        config = TINY
        rng = np.random.default_rng(0)
        image = rng.integers(0, 256, size=(80, 96, 3), dtype=np.uint8)
        rowcols = rng.integers(0, 80, size=(10, 2)).astype(np.int32)
        rowcols[:, 1] %= 96

        single = build_extractor(config=config, backbone_batch=8)
        mesh = make_mesh(8)
        sharded = build_extractor(config=config, backbone_batch=8, mesh=mesh)

        np.testing.assert_allclose(
            sharded.extract_features(image, rowcols),
            single.extract_features(image, rowcols),
            rtol=1e-4,
            atol=1e-5,
        )

    def test_indivisible_backbone_batch_rejected(self):
        from mermaid_classifier_tpu.models.extractor import build_extractor
        from mermaid_classifier_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8)
        import pytest

        with pytest.raises(ValueError, match="divisible"):
            build_extractor(config=TINY, backbone_batch=12, mesh=mesh)


class TestNumericsGate:
    def test_bf16_gate_compares_against_f32(self):
        """The gate must pass for a sane bf16 trunk (device bf16 vs host
        f32) and must not crash under a mesh whose size doesn't divide the
        probe count."""
        from dataclasses import replace

        from mermaid_classifier_tpu.models.extractor import build_extractor
        from mermaid_classifier_tpu.parallel.mesh import make_mesh

        bf16 = build_extractor(
            config=replace(TINY, compute_dtype="bfloat16"), backbone_batch=8
        )
        worst = bf16.verify_device_numerics(n_patches=6)
        assert worst >= 0.999

        meshed = build_extractor(
            config=TINY, backbone_batch=8, mesh=make_mesh(8)
        )
        # 6 patches do not divide 8 devices; the probe must still work.
        assert meshed.verify_device_numerics(n_patches=6) >= 0.999


class TestCrossImageBatching:
    def test_matches_per_image(self, tmp_path):
        import numpy as np

        from mermaid_classifier_tpu.models.extractor import build_extractor

        rng = np.random.default_rng(0)
        extractor = build_extractor(config=TINY, backbone_batch=16,
                                    point_bucket=4)
        items = []
        for i in range(3):
            h, w = 50 + 10 * i, 60
            image = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            n = 3 + i  # ragged point counts
            rowcols = np.stack(
                [rng.integers(0, h, n), rng.integers(0, w, n)], axis=1
            ).astype(np.int32)
            items.append((image, rowcols))

        packed = extractor.extract_features_many(items)
        for (image, rowcols), got in zip(items, packed):
            expected = extractor.extract_features(image, rowcols)
            np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

    def test_empty_and_mixed(self):
        import numpy as np

        from mermaid_classifier_tpu.models.extractor import build_extractor

        extractor = build_extractor(config=TINY, backbone_batch=8,
                                    point_bucket=4)
        rng = np.random.default_rng(1)
        image = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        items = [
            (image, np.zeros((0, 2), np.int32)),
            (image, np.array([[5, 5], [10, 10]], np.int32)),
        ]
        out = extractor.extract_features_many(items)
        assert out[0].shape == (0, TINY.feature_dim)
        assert out[1].shape == (2, TINY.feature_dim)


class TestExtractorTfSamePadding:
    """The full extraction path (gather -> folded backbone) honors
    padding='tf_same': the extractor's features must match the flax
    tf_same forward on the same gathered patches, and differ from the
    symmetric graph — at the INTEGRATION level, not just the module."""

    def test_folded_extractor_matches_flax_tf_same(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from mermaid_classifier_tpu.models.efficientnet import (
            EfficientNetBackbone,
            EfficientNetConfig,
            init_backbone_params,
        )
        from mermaid_classifier_tpu.models.extractor import FeatureExtractor
        from mermaid_classifier_tpu.ops.patch_ops import (
            channel_scale_bias,
            extract_patches_xla,
        )

        config = EfficientNetConfig(
            stem_channels=8,
            stages=((1, 8, 1, 1, 3), (6, 16, 1, 2, 5)),
            head_channels=32,
            feature_dim=48,
            patch_size=32,
            padding="tf_same",
        )
        variables = init_backbone_params(0, config)
        rng = np.random.default_rng(0)
        image = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        rowcols = np.asarray([[10, 12], [40, 50], [31, 7]], np.int32)

        extractor = FeatureExtractor(
            variables, config, backbone_batch=4, backbone_impl="folded"
        )
        got = extractor.extract_features(image, rowcols)

        half = config.patch_size // 2
        padded = np.zeros((64 + 2 * half, 64 + 2 * half, 3), np.uint8)
        padded[half:-half, half:-half] = image
        scale, bias = channel_scale_bias(config.mean_rgb, config.std_rgb)
        patches = extract_patches_xla(
            jnp.asarray(padded), jnp.asarray(rowcols), config.patch_size,
            jnp.asarray(scale), jnp.asarray(bias),
        )
        model = EfficientNetBackbone(config=config)
        want = np.asarray(jax.jit(model.apply)(variables, patches))
        np.testing.assert_allclose(
            np.asarray(got), want, atol=2e-4, rtol=1e-4
        )

        # And the symmetric graph on the same weights must NOT agree —
        # the padding mode is load-bearing through the extractor too.
        import dataclasses

        sym = dataclasses.replace(config, padding="symmetric")
        extractor_sym = FeatureExtractor(
            variables, sym, backbone_batch=4, backbone_impl="folded"
        )
        got_sym = np.asarray(extractor_sym.extract_features(image, rowcols))
        assert float(np.mean(np.abs(got_sym - want))) > 1e-4
