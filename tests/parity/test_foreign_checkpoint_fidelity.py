"""Real-checkpoint fidelity: remap + convert + forward-diff on state_dicts
this repo did not author.

The BASELINE.md contract is <1e-4 feature MAE vs the reference EfficientNet
(reference: scripts/build_feature_bucket.py:451-502 — the reference runs a
numerics gate because even its own mps/cuda devices drift). No real
checkpoint is downloadable here, so these tests push torch.save'd
checkpoints from the two PUBLIC module layouts (tests/parity/
foreign_checkpoints.py — key names from genuine module nesting, forwards
as independent oracles) through the REAL ingestion path:

    torch.load -> strip_module_prefix -> detect_naming_scheme ->
    remap_state_dict -> torch_state_dict_to_variables -> Flax forward

and assert the Flax features reproduce the foreign model's own forward to
<1e-4 MAE. The lukemelas case is the production-shaped one (pyspacer
lineage: TF-SAME asymmetric padding, BN eps 1e-3, ``_fc`` as the 4096-dim
projection); a negative test proves symmetric padding does NOT reproduce
it, i.e. the padding config is load-bearing, not decorative.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mermaid_classifier_tpu.models.convert import (  # noqa: E402
    WeightConversionError,
    torch_state_dict_to_variables,
)
from mermaid_classifier_tpu.models.efficientnet import (  # noqa: E402
    EfficientNetBackbone,
    EfficientNetConfig,
)
from mermaid_classifier_tpu.models.remap import (  # noqa: E402
    RemapError,
    detect_naming_scheme,
    remap_state_dict,
    strip_module_prefix,
)

PROBE_BATCH = 3
FEATURE_TOL = 1e-4


def _roundtrip_checkpoint(model, tmp_path, wrap_module_prefix=False):
    """torch.save -> torch.load, optionally with a DataParallel-style
    'module.' prefix — the on-disk shape a downloaded checkpoint has."""
    sd = model.state_dict()
    if wrap_module_prefix:
        sd = {f"module.{k}": v for k, v in sd.items()}
    path = tmp_path / "ckpt.pt"
    torch.save(sd, path)
    return torch.load(path, map_location="cpu", weights_only=True)


def _probe(seed=7, size=224):
    rng = np.random.default_rng(seed)
    nhwc = rng.normal(size=(PROBE_BATCH, size, size, 3)).astype(np.float32)
    return nhwc, np.transpose(nhwc, (0, 3, 1, 2)).copy()


def _flax_forward(variables, config, probe_nhwc):
    import jax

    model = EfficientNetBackbone(config=config)
    return np.asarray(jax.jit(model.apply)(variables, probe_nhwc))


def _torch_forward(model, probe_nchw):
    with torch.no_grad():
        return model(torch.from_numpy(probe_nchw)).numpy()


class TestTorchvisionCheckpoint:
    """torchvision.models.efficientnet_b0-layout checkpoint: symmetric
    padding, BN eps 1e-5, classifier head to drop, no 4096 projection."""

    @pytest.fixture(scope="class")
    def fixture(self, tmp_path_factory):
        from tests.parity.foreign_checkpoints import build_torchvision_b0

        model = build_torchvision_b0(seed=11)
        sd = _roundtrip_checkpoint(
            model, tmp_path_factory.mktemp("tv"), wrap_module_prefix=True
        )
        config = EfficientNetConfig(feature_dim=1280, bn_eps=1e-5)
        stripped = strip_module_prefix(sd)
        scheme = detect_naming_scheme(stripped)
        canonical, applied, dropped = remap_state_dict(
            stripped, config, scheme
        )
        variables = torch_state_dict_to_variables(canonical, config)
        return {
            "model": model, "config": config, "scheme": scheme,
            "applied": applied, "dropped": dropped, "variables": variables,
        }

    def test_scheme_detected(self, fixture):
        assert fixture["scheme"] == "torchvision"

    def test_classifier_and_bn_bookkeeping_dropped(self, fixture):
        dropped = fixture["dropped"]
        assert "classifier.1.weight" in dropped
        assert "classifier.1.bias" in dropped
        assert any(k.endswith("num_batches_tracked") for k in dropped)

    def test_every_nondropped_key_mapped(self, fixture):
        model_keys = set(fixture["model"].state_dict())
        assert set(fixture["applied"]) | set(fixture["dropped"]) == model_keys

    def test_features_reproduce_below_1e4_mae(self, fixture):
        probe_nhwc, probe_nchw = _probe()
        ours = _flax_forward(
            fixture["variables"], fixture["config"], probe_nhwc
        )
        theirs = _torch_forward(fixture["model"], probe_nchw)
        mae = float(np.mean(np.abs(ours - theirs)))
        assert ours.shape == theirs.shape == (PROBE_BATCH, 1280)
        assert mae < FEATURE_TOL, f"feature MAE {mae:.2e} >= {FEATURE_TOL}"

    def test_truncated_checkpoint_refused(self, fixture):
        sd = dict(fixture["model"].state_dict())
        # Remap of a complete key set that converts to a missing layer:
        # drop one mapped tensor -> conversion must fail loudly.
        sd.pop("features.3.0.block.1.0.weight")
        canonical, _, _ = remap_state_dict(
            sd, fixture["config"], "torchvision"
        )
        with pytest.raises(WeightConversionError):
            torch_state_dict_to_variables(canonical, fixture["config"])

    def test_alien_key_refused(self, fixture):
        sd = dict(fixture["model"].state_dict())
        sd["features.3.0.block.9.0.weight"] = torch.zeros(1)
        with pytest.raises(RemapError):
            remap_state_dict(sd, fixture["config"], "torchvision")


class TestLukemelasCheckpoint:
    """lukemelas/EfficientNet-PyTorch-layout checkpoint — the pyspacer
    production lineage: TF-SAME asymmetric padding, BN eps 1e-3, ``_fc``
    as the 1280->4096 feature projection."""

    @pytest.fixture(scope="class")
    def fixture(self, tmp_path_factory):
        from tests.parity.foreign_checkpoints import build_lukemelas_b0

        model = build_lukemelas_b0(seed=23, feature_dim=4096)
        sd = _roundtrip_checkpoint(model, tmp_path_factory.mktemp("lm"))
        config = EfficientNetConfig(feature_dim=4096, padding="tf_same")
        scheme = detect_naming_scheme(sd)
        canonical, applied, dropped = remap_state_dict(sd, config, scheme)
        variables = torch_state_dict_to_variables(canonical, config)
        return {
            "model": model, "config": config, "scheme": scheme,
            "applied": applied, "dropped": dropped, "variables": variables,
        }

    def test_scheme_detected(self, fixture):
        assert fixture["scheme"] == "lukemelas"

    def test_fc_taken_as_feature_projection(self, fixture):
        assert fixture["applied"]["_fc.weight"] == "feature_projection.weight"
        assert fixture["applied"]["_fc.bias"] == "feature_projection.bias"

    def test_features_reproduce_below_1e4_mae(self, fixture):
        probe_nhwc, probe_nchw = _probe(seed=8)
        ours = _flax_forward(
            fixture["variables"], fixture["config"], probe_nhwc
        )
        theirs = _torch_forward(fixture["model"], probe_nchw)
        mae = float(np.mean(np.abs(ours - theirs)))
        assert ours.shape == theirs.shape == (PROBE_BATCH, 4096)
        assert mae < FEATURE_TOL, f"feature MAE {mae:.2e} >= {FEATURE_TOL}"

    def test_symmetric_padding_does_not_reproduce(self, fixture):
        # The load-bearing negative: running lukemelas weights through the
        # symmetric-padding graph (the torchvision-style default) must
        # FAIL the 1e-4 gate — asymmetric TF-SAME at the stride-2 layers
        # moves the features. If this ever passes, the padding plumbing is
        # dead code and the fidelity test above proves nothing.
        probe_nhwc, probe_nchw = _probe(seed=8)
        wrong = EfficientNetConfig(feature_dim=4096, padding="symmetric")
        ours = _flax_forward(fixture["variables"], wrong, probe_nhwc)
        theirs = _torch_forward(fixture["model"], probe_nchw)
        mae = float(np.mean(np.abs(ours - theirs)))
        assert mae > FEATURE_TOL

    def test_fc_with_imagenet_head_is_dropped_instead(self, tmp_path):
        # A lukemelas checkpoint whose _fc is a 1000-class ImageNet head
        # (out-dim != feature_dim) must have _fc DROPPED, not remapped.
        from tests.parity.foreign_checkpoints import build_lukemelas_b0

        model = build_lukemelas_b0(seed=3, feature_dim=1000)
        sd = _roundtrip_checkpoint(model, tmp_path)
        config = EfficientNetConfig(feature_dim=4096)
        _, applied, dropped = remap_state_dict(sd, config, "lukemelas")
        assert "_fc.weight" in dropped and "_fc.bias" in dropped
        assert "_fc.weight" not in applied


class TestFoldedScheduleUnderTfSame:
    """The production 'folded' schedule must honor padding='tf_same' too —
    real weights will run through apply_folded, not the flax module."""

    def test_folded_matches_flax_tf_same(self):
        import jax

        from mermaid_classifier_tpu.models.efficientnet import (
            init_backbone_params,
        )
        from mermaid_classifier_tpu.ops.fused_mbconv import (
            apply_folded,
            fold_backbone,
        )

        config = EfficientNetConfig(feature_dim=4096, padding="tf_same")
        variables = init_backbone_params(0, config)
        probe_nhwc, _ = _probe(seed=5)
        ref = _flax_forward(variables, config, probe_nhwc)
        folded = fold_backbone(variables, config)
        got = np.asarray(
            jax.jit(lambda v, x: apply_folded(v, config, x))(
                folded, probe_nhwc
            )
        )
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)

    def test_folded_symmetric_differs_from_tf_same(self):
        import jax

        from mermaid_classifier_tpu.models.efficientnet import (
            init_backbone_params,
        )
        from mermaid_classifier_tpu.ops.fused_mbconv import (
            apply_folded,
            fold_backbone,
        )

        cfg_sym = EfficientNetConfig(feature_dim=4096)
        cfg_tf = EfficientNetConfig(feature_dim=4096, padding="tf_same")
        variables = init_backbone_params(0, cfg_sym)
        probe_nhwc, _ = _probe(seed=5)
        folded = fold_backbone(variables, cfg_sym)
        out_sym = np.asarray(
            jax.jit(lambda v, x: apply_folded(v, cfg_sym, x))(
                folded, probe_nhwc
            )
        )
        out_tf = np.asarray(
            jax.jit(lambda v, x: apply_folded(v, cfg_tf, x))(
                folded, probe_nhwc
            )
        )
        assert float(np.mean(np.abs(out_sym - out_tf))) > 0
