"""Backbone shape/determinism tests and the torch->flax weight-conversion
parity gate (the layer-by-layer diff harness SURVEY.md §7 calls for)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mermaid_classifier_tpu.models.convert import (
    WeightConversionError,
    load_backbone_npz,
    save_backbone_npz,
    torch_state_dict_to_variables,
)
from mermaid_classifier_tpu.models.efficientnet import (
    EfficientNetBackbone,
    EfficientNetConfig,
    init_backbone_params,
)

# A shrunk config keeps tests seconds-fast while exercising every layer type
# (expand==1 stage, expand>1 stages, stride-2, 5x5 kernels, SE, projection).
TINY = EfficientNetConfig(
    stem_channels=8,
    stages=(
        (1, 8, 1, 1, 3),
        (6, 12, 2, 2, 3),
        (6, 16, 1, 2, 5),
    ),
    head_channels=32,
    feature_dim=48,
    patch_size=32,
)


class TestBackbone:
    def test_output_shape_and_determinism(self):
        variables = init_backbone_params(jax.random.PRNGKey(0), TINY)
        model = EfficientNetBackbone(config=TINY)
        x = jnp.asarray(
            np.random.default_rng(0).random((3, 32, 32, 3)).astype(np.float32)
        )
        out1 = model.apply(variables, x)
        out2 = model.apply(variables, x)
        assert out1.shape == (3, 48)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_b0_default_structure(self):
        cfg = EfficientNetConfig()
        assert cfg.feature_dim == 4096  # production contract (settings.py:7-8)
        assert cfg.patch_size == 224
        # eval_shape traces without compiling — full-B0 init on CPU is slow.
        model = EfficientNetBackbone(config=cfg)
        variables = jax.eval_shape(
            model.init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.patch_size, cfg.patch_size, 3), jnp.float32),
        )
        params = variables["params"]
        # 7 stages totalling 16 blocks + stem + head + projection.
        blocks = [k for k in params if k.startswith("stage")]
        assert len(blocks) == 16
        assert "feature_projection" in params

    def test_config_roundtrip(self):
        d = TINY.to_dict()
        assert EfficientNetConfig.from_dict(d) == TINY

    def test_npz_bundle_roundtrip(self, tmp_path):
        variables = init_backbone_params(jax.random.PRNGKey(0), TINY)
        path = str(tmp_path / "backbone.npz")
        save_backbone_npz(path, jax.device_get(variables))
        restored = load_backbone_npz(path)
        model = EfficientNetBackbone(config=TINY)
        x = jnp.asarray(
            np.random.default_rng(1).random((2, 32, 32, 3)).astype(np.float32)
        )
        np.testing.assert_array_equal(
            np.asarray(model.apply(variables, x)),
            np.asarray(model.apply(restored, x)),
        )

    def test_npz_config_sidecar_roundtrip(self, tmp_path):
        """The padding/bn_eps lineage decision travels WITH the weights:
        save_backbone_npz(config=...) writes a sidecar and
        load_backbone_bundle returns the exact config — the guard against
        converted tf_same weights silently running the symmetric graph."""
        import dataclasses

        from mermaid_classifier_tpu.models.convert import load_backbone_bundle

        config = dataclasses.replace(TINY, padding="tf_same", bn_eps=1e-3)
        variables = init_backbone_params(jax.random.PRNGKey(0), config)
        path = str(tmp_path / "backbone.npz")
        save_backbone_npz(path, jax.device_get(variables), config)
        assert (tmp_path / "backbone.config.json").is_file()
        restored, restored_config = load_backbone_bundle(path)
        assert restored_config == config
        assert restored_config.padding == "tf_same"
        # Pre-sidecar bundles still load, with config=None.
        save_backbone_npz(str(tmp_path / "bare.npz"), jax.device_get(variables))
        _, none_config = load_backbone_bundle(str(tmp_path / "bare.npz"))
        assert none_config is None

    def test_bucket_cli_resolves_sidecar_config(self, tmp_path):
        """build_feature_bucket's backbone resolution defaults to the
        sidecar config; explicit field flags override single fields and an
        explicit --backbone-config-json overrides the whole geometry."""
        import dataclasses

        import scripts.build_feature_bucket as cli

        config = dataclasses.replace(TINY, padding="tf_same")
        variables = init_backbone_params(jax.random.PRNGKey(0), config)
        path = str(tmp_path / "backbone.npz")
        save_backbone_npz(path, jax.device_get(variables), config)

        base = ["--source-ids", "1", "--source-bucket", "a",
                "--target-bucket", "b", "--backbone-weights", path]
        parser = cli.build_parser()

        weights, resolved = cli.resolve_backbone(parser.parse_args(base))
        assert weights is not None
        assert resolved == config  # sidecar IS the default

        _, overridden = cli.resolve_backbone(
            parser.parse_args(base + ["--backbone-padding", "symmetric"])
        )
        assert overridden.padding == "symmetric"  # flag overrides field
        assert overridden.stem_channels == config.stem_channels

        import json

        other = dataclasses.replace(TINY, feature_dim=TINY.head_channels)
        cfg_json = tmp_path / "other.json"
        cfg_json.write_text(json.dumps(other.to_dict()))
        _, explicit = cli.resolve_backbone(
            parser.parse_args(base + ["--backbone-config-json", str(cfg_json)])
        )
        assert explicit == other  # explicit geometry wins over sidecar


class TestTorchConversionParity:
    """Converted torch weights must reproduce torch outputs within the
    production feature-fidelity gate (<1e-4 MAE; BASELINE.md targets)."""

    @pytest.fixture(scope="class")
    def torch_and_flax(self):
        import torch

        from tests.parity.torch_efficientnet_ref import (
            TorchEfficientNetBackbone,
            randomize_bn_stats,
        )

        torch.manual_seed(0)
        tmodel = TorchEfficientNetBackbone(TINY)
        randomize_bn_stats(tmodel, seed=1)
        tmodel.eval()
        variables = torch_state_dict_to_variables(tmodel.state_dict(), TINY)
        return tmodel, variables

    def test_feature_parity(self, torch_and_flax):
        import torch

        tmodel, variables = torch_and_flax
        rng = np.random.default_rng(0)
        x = rng.random((4, 32, 32, 3)).astype(np.float32)

        with torch.no_grad():
            expected = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got = np.asarray(
            EfficientNetBackbone(config=TINY).apply(variables, jnp.asarray(x))
        )
        mae = float(np.mean(np.abs(expected - got)))
        assert mae < 1e-4, f"feature MAE {mae} exceeds the 1e-4 fidelity gate"
        np.testing.assert_allclose(got, expected, atol=5e-4)

    def test_missing_key_fails_loudly(self, torch_and_flax):
        tmodel, _ = torch_and_flax
        sd = dict(tmodel.state_dict())
        sd.pop("stem.conv.weight")
        with pytest.raises(WeightConversionError, match="missing key"):
            torch_state_dict_to_variables(sd, TINY)

    def test_unconsumed_key_fails_loudly(self, torch_and_flax):
        import torch

        tmodel, _ = torch_and_flax
        sd = dict(tmodel.state_dict())
        sd["rogue.weight"] = torch.zeros(1)
        with pytest.raises(WeightConversionError, match="unconsumed"):
            torch_state_dict_to_variables(sd, TINY)
        # strict=False tolerates extras (e.g. training-only buffers).
        torch_state_dict_to_variables(sd, TINY, strict=False)


class TestComputeDtype:
    """bfloat16 trunk: opt-in fast path, float32 output contract intact."""

    def test_bf16_close_to_f32(self):
        import jax
        import jax.numpy as jnp

        from mermaid_classifier_tpu.models.efficientnet import (
            EfficientNetBackbone,
            EfficientNetConfig,
            init_backbone_params,
        )

        cfg32 = EfficientNetConfig(
            stem_channels=8,
            stages=((1, 8, 1, 1, 3), (6, 16, 1, 2, 3)),
            head_channels=32,
            feature_dim=32,
            patch_size=32,
        )
        cfg16 = EfficientNetConfig(**{**cfg32.to_dict(), "stages": cfg32.stages,
                                      "mean_rgb": cfg32.mean_rgb,
                                      "std_rgb": cfg32.std_rgb,
                                      "compute_dtype": "bfloat16"})
        variables = init_backbone_params(0, cfg32)
        x = jnp.asarray(
            np.random.default_rng(0).random((4, 32, 32, 3)).astype(np.float32)
        )
        f32 = np.asarray(jax.jit(EfficientNetBackbone(config=cfg32).apply)(variables, x))
        f16 = np.asarray(jax.jit(EfficientNetBackbone(config=cfg16).apply)(variables, x))
        assert f16.dtype == np.float32  # output contract stays float32
        num = np.sum(f32 * f16, axis=1)
        den = np.linalg.norm(f32, axis=1) * np.linalg.norm(f16, axis=1)
        assert float(np.min(num / np.maximum(den, 1e-12))) > 0.999

    def test_config_dict_roundtrip_carries_dtype(self):
        from mermaid_classifier_tpu.models.efficientnet import EfficientNetConfig

        cfg = EfficientNetConfig(compute_dtype="bfloat16")
        assert EfficientNetConfig.from_dict(cfg.to_dict()).compute_dtype == "bfloat16"
        # Older serialized configs (no compute_dtype key) default to float32.
        d = cfg.to_dict()
        del d["compute_dtype"]
        assert EfficientNetConfig.from_dict(d).compute_dtype == "float32"


class TestVariantConfigs:
    """Compound-scaled variant presets (b0..b3): the published width/depth
    tables, artifact-config round trips, and shape-generic forwards."""

    def test_published_tables(self):
        from mermaid_classifier_tpu.models.efficientnet import variant_config

        expected = {
            "b0": (32, 1280, 224, [16, 24, 40, 80, 112, 192, 320],
                   [1, 2, 2, 3, 3, 4, 1]),
            "b1": (32, 1280, 240, [16, 24, 40, 80, 112, 192, 320],
                   [2, 3, 3, 4, 4, 5, 2]),
            "b2": (32, 1408, 260, [16, 24, 48, 88, 120, 208, 352],
                   [2, 3, 3, 4, 4, 5, 2]),
            "b3": (40, 1536, 300, [24, 32, 48, 96, 136, 232, 384],
                   [2, 3, 3, 5, 5, 6, 2]),
        }
        for name, (stem, head, res, widths, depths) in expected.items():
            cfg = variant_config(name)
            assert cfg.stem_channels == stem, name
            assert cfg.head_channels == head, name
            assert cfg.patch_size == res, name
            assert [s[1] for s in cfg.stages] == widths, name
            assert [s[2] for s in cfg.stages] == depths, name

    def test_name_normalization_and_unknown(self):
        import pytest

        from mermaid_classifier_tpu.models.efficientnet import variant_config

        assert variant_config("EfficientNet-B2") == variant_config("b2")
        with pytest.raises(ValueError, match="variant"):
            variant_config("b9")

    def test_variant_forward_shapes_and_fold(self):
        """b1 traces end to end (eval_shape only — no device compute) and
        the BN-folding path consumes the scaled topology unchanged."""
        import jax

        from mermaid_classifier_tpu.models.efficientnet import (
            EfficientNetBackbone,
            init_backbone_params,
            variant_config,
        )
        from mermaid_classifier_tpu.ops.fused_mbconv import (
            block_metas,
            fold_backbone,
        )

        cfg = variant_config("b1", feature_dim=4096)
        variables = init_backbone_params(0, cfg)
        model = EfficientNetBackbone(config=cfg)
        out = jax.eval_shape(
            model.apply,
            variables,
            jax.ShapeDtypeStruct((2, cfg.patch_size, cfg.patch_size, 3), jnp.float32),
        )
        assert out.shape == (2, 4096)
        folded = fold_backbone(variables, cfg)
        assert len(folded["blocks"]) == sum(s[2] for s in cfg.stages)
        assert block_metas(cfg)[0].h == cfg.patch_size // 2


def test_variant_presets_cover_b0_through_b7_and_match_cli():
    """b4-b7 presets exist with the published compound coefficients, and
    the extraction CLI's literal choices tuple stays in sync with the
    preset dict."""
    from mermaid_classifier_tpu.models.efficientnet import (
        VARIANT_COEFFS,
        variant_config,
    )

    assert sorted(VARIANT_COEFFS) == [f"b{i}" for i in range(8)]
    # Published geometry spot checks: b4 widens to 48-ch stem / 1792 head
    # at 380 res; b7 to 64 / 2560 at 600.
    b4 = variant_config("b4")
    assert (b4.stem_channels, b4.head_channels, b4.patch_size) == (
        48, 1792, 380,
    )
    b7 = variant_config("b7")
    assert (b7.stem_channels, b7.head_channels, b7.patch_size) == (
        64, 2560, 600,
    )

    # CLI/preset sync: the --backbone-variant choices must be exactly the
    # VARIANT_COEFFS presets — inspect the real parser, not source text,
    # so benign reformats can't trip the guard.
    import scripts.build_feature_bucket as cli

    parser = cli.build_parser()
    (variant_action,) = [
        a for a in parser._actions if "--backbone-variant" in a.option_strings
    ]
    assert sorted(variant_action.choices) == sorted(VARIANT_COEFFS)


@pytest.mark.parametrize("variant", ["b4", "b5", "b6", "b7"])
@pytest.mark.parametrize("padding", ["symmetric", "tf_same"])
def test_large_variant_geometry_traces(variant, padding):
    """The big presets' full geometry chains (incl. odd-size stride-2
    transitions like b4's 95->48) trace through the trunk in both padding
    modes — pure eval_shape, zero compute, so even b7 at 600^2 is free."""
    import dataclasses

    import jax

    from mermaid_classifier_tpu.models.efficientnet import (
        EfficientNetBackbone,
        variant_config,
    )

    config = dataclasses.replace(variant_config(variant), padding=padding)
    model = EfficientNetBackbone(config=config)
    dummy = jax.ShapeDtypeStruct(
        (1, config.patch_size, config.patch_size, 3), jnp.float32
    )
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), dummy)
    out = jax.eval_shape(model.apply, shapes, dummy)
    assert out.shape == (1, config.feature_dim)
