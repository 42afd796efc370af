"""Remap tests: torchvision- and lukemelas-named checkpoints map onto the
canonical naming and convert to a Flax model whose activations match the
torch execution of the same weights (the real-weights landing strip)."""

import numpy as np
import pytest

from mermaid_classifier_tpu.models.convert import torch_state_dict_to_variables
from mermaid_classifier_tpu.models.efficientnet import EfficientNetConfig
from mermaid_classifier_tpu.models.remap import (
    RemapError,
    _lukemelas_table,
    _torchvision_table,
    detect_naming_scheme,
    remap_state_dict,
    strip_module_prefix,
)

# Two-stage config: covers the expand==1 sub-block shift AND multi-block
# stages, while staying seconds-fast.
SMALL = EfficientNetConfig(
    stem_channels=8,
    stages=((1, 8, 1, 1, 3), (6, 16, 2, 2, 3)),
    head_channels=24,
    feature_dim=32,
    patch_size=32,
)


def mirror_state_dict(config=SMALL, seed=0):
    import torch

    from tests.parity.torch_efficientnet_ref import (
        TorchEfficientNetBackbone,
        randomize_bn_stats,
    )

    torch.manual_seed(seed)
    mirror = TorchEfficientNetBackbone(config)
    randomize_bn_stats(mirror, seed=seed)
    return mirror, {
        k: v.detach().numpy()
        for k, v in mirror.state_dict().items()
        if not k.endswith("num_batches_tracked")
    }


def rename_with_inverse(canonical_sd, table, extra=()):
    """Build a foreign-named state_dict by inverting the remap table."""
    inverse = {new: old for old, new in table.items()}
    foreign = {}
    for key, value in canonical_sd.items():
        if key in inverse:
            foreign[inverse[key]] = value
        else:
            foreign[key] = value  # e.g. feature_projection (handled per test)
    for key, value in extra:
        foreign[key] = value
    return foreign


class TestDetection:
    def test_detects_each_scheme(self):
        assert detect_naming_scheme(["stem.conv.weight"]) == "canonical"
        assert detect_naming_scheme(["features.0.0.weight"]) == "torchvision"
        assert detect_naming_scheme(["_conv_stem.weight"]) == "lukemelas"
        with pytest.raises(RemapError, match="unrecognized"):
            detect_naming_scheme(["resnet.layer1.weight"])

    def test_module_prefix_stripped(self):
        sd = {"module._conv_stem.weight": 1, "module._bn0.weight": 2}
        stripped = strip_module_prefix(sd)
        assert set(stripped) == {"_conv_stem.weight", "_bn0.weight"}
        assert detect_naming_scheme(stripped) == "lukemelas"


class TestTorchvisionRemap:
    def test_round_trip_conversion_identical(self):
        _, canonical_sd = mirror_state_dict()
        table, _ = _torchvision_table(SMALL)
        # torchvision has no feature projection; drop it from the source and
        # use a projection-free config for this comparison.
        config = EfficientNetConfig.from_dict(
            {**SMALL.to_dict(), "feature_dim": 24}
        )
        canonical_sd = {
            k: v for k, v in canonical_sd.items()
            if not k.startswith("feature_projection")
        }
        foreign = rename_with_inverse(
            canonical_sd, table,
            extra=[("classifier.1.weight", np.zeros((10, 24), np.float32)),
                   ("classifier.1.bias", np.zeros((10,), np.float32))],
        )
        remapped, applied, dropped = remap_state_dict(foreign, config)
        assert dropped == ["classifier.1.bias", "classifier.1.weight"] or set(
            dropped
        ) == {"classifier.1.bias", "classifier.1.weight"}
        assert remapped.keys() == canonical_sd.keys()
        for key in canonical_sd:
            np.testing.assert_array_equal(remapped[key], canonical_sd[key])
        # And the converter accepts the remapped dict wholesale.
        variables = torch_state_dict_to_variables(remapped, config)
        assert "stem" in variables["params"]

    def test_unknown_key_refused(self):
        _, canonical_sd = mirror_state_dict()
        table, _ = _torchvision_table(SMALL)
        foreign = rename_with_inverse(
            {k: v for k, v in canonical_sd.items()
             if not k.startswith("feature_projection")},
            table,
        )
        foreign["features.9.0.weight"] = np.zeros((1, 1, 1, 1), np.float32)
        config = EfficientNetConfig.from_dict(
            {**SMALL.to_dict(), "feature_dim": 24}
        )
        with pytest.raises(RemapError, match="no mapping"):
            remap_state_dict(foreign, config)


class TestLukemelasRemap:
    def test_round_trip_with_fc_as_projection(self):
        _, canonical_sd = mirror_state_dict()
        table, _ = _lukemelas_table(SMALL)
        foreign = rename_with_inverse(
            {k: v for k, v in canonical_sd.items()
             if not k.startswith("feature_projection")},
            table,
        )
        # _fc whose out-dim equals feature_dim IS the projection.
        foreign["_fc.weight"] = canonical_sd["feature_projection.weight"]
        foreign["_fc.bias"] = canonical_sd["feature_projection.bias"]
        remapped, applied, dropped = remap_state_dict(foreign, SMALL)
        assert dropped == []
        assert remapped.keys() == canonical_sd.keys()
        for key in canonical_sd:
            np.testing.assert_array_equal(remapped[key], canonical_sd[key])

    def test_classifier_fc_dropped(self):
        _, canonical_sd = mirror_state_dict()
        table, _ = _lukemelas_table(SMALL)
        foreign = rename_with_inverse(
            {k: v for k, v in canonical_sd.items()
             if not k.startswith("feature_projection")},
            table,
        )
        # An ImageNet _fc (1000-way, != feature_dim) must be dropped.
        foreign["_fc.weight"] = np.zeros((1000, 24), np.float32)
        foreign["_fc.bias"] = np.zeros((1000,), np.float32)
        config = EfficientNetConfig.from_dict(
            {**SMALL.to_dict(), "feature_dim": 24}
        )
        remapped, _, dropped = remap_state_dict(foreign, config)
        assert set(dropped) == {"_fc.weight", "_fc.bias"}
        assert "feature_projection.weight" not in remapped


class TestDiffHarness:
    def test_self_test_all_green_small_arch(self, tmp_path, monkeypatch):
        """The landing-strip CLI: foreign-named weights -> remap -> convert
        -> per-layer diff, all green, remap table dumped."""
        import subprocess
        import sys
        from pathlib import Path

        import torch

        repo = Path(__file__).resolve().parents[2]
        mirror, canonical_sd = mirror_state_dict()
        table, _ = _lukemelas_table(SMALL)
        foreign = rename_with_inverse(
            {k: v for k, v in canonical_sd.items()
             if not k.startswith("feature_projection")},
            table,
        )
        foreign["_fc.weight"] = canonical_sd["feature_projection.weight"]
        foreign["_fc.bias"] = canonical_sd["feature_projection.bias"]
        weights = tmp_path / "lukemelas.pt"
        torch.save({k: torch.as_tensor(v) for k, v in foreign.items()}, weights)

        config_json = tmp_path / "config.json"
        import json

        config_json.write_text(json.dumps(SMALL.to_dict()))
        proc = subprocess.run(
            [sys.executable, str(repo / "scripts" / "diff_backbone.py"),
             str(weights),
             "--config-json", str(config_json),
             "--dump-remap", str(tmp_path / "remap.csv")],
            capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert "ALL GREEN" in proc.stdout
        assert "naming scheme: lukemelas" in proc.stdout
        remap_csv = (tmp_path / "remap.csv").read_text()
        assert "_conv_stem.weight,stem.conv.weight" in remap_csv
