"""Pyspacer-lineage extraction fidelity: the FULL production pipeline
diffed against the reconstructed pyspacer 0.14.0 oracle.

The production contract is <1e-4 feature MAE vs the reference's released
``efficientnet.pt`` run through ``spacer.extractors.EfficientNetExtractor``
(reference: scripts/build_feature_bucket.py:375-502, release_artifact.py:35).
The real weights are unreachable in this environment, so these tests close
every OTHER delta: a checkpoint is written in the production container shape
({'net': {'module.<key>': tensor}} — the CoralNet DataParallel checkpoint
dict), ingested through the repo's REAL path (diff_backbone.load_state_dict
-> strip_module_prefix -> remap -> convert -> FeatureExtractor), and the
resulting per-point features are diffed end to end — image in, features out,
including the crop geometry, zero border, ImageNet normalization, batch
order, and edge points — against ``PyspacerExtractorOracle``
(tests/parity/foreign_checkpoints.py), which restates pyspacer's
load_weights / crop_patches / transformation / batched-forward semantics
independently. After these, the only untested delta vs the real release is
the literal weight values.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = Path(__file__).resolve().parents[2]

from mermaid_classifier_tpu.models.convert import (  # noqa: E402
    torch_state_dict_to_variables,
)
from mermaid_classifier_tpu.models.efficientnet import (  # noqa: E402
    EfficientNetConfig,
)
from mermaid_classifier_tpu.models.remap import (  # noqa: E402
    detect_naming_scheme,
    remap_state_dict,
    strip_module_prefix,
)

FEATURE_TOL = 1e-4


def _load_diff_backbone():
    spec = importlib.util.spec_from_file_location(
        "diff_backbone", REPO / "scripts" / "diff_backbone.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _synth_image(seed: int = 0, size=(283, 317)):
    """A non-square, off-bucket RGB uint8 PIL image with real structure
    (gradients + blobs), NOT white noise — boundary bugs hide in noise."""
    from PIL import Image

    h, w = size
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [
            127 + 100 * np.sin(xx / 23.0) * np.cos(yy / 31.0),
            127 + 100 * np.cos(xx / 17.0 + 1.0),
            127 + 100 * np.sin(yy / 29.0 + 2.0),
        ],
        axis=-1,
    )
    base += rng.normal(0, 12, size=(h, w, 3))
    return Image.fromarray(np.clip(base, 0, 255).astype(np.uint8))


#: Points stressing every crop regime: the four corners (crop mostly zero
#: border), edges, and interior — (row, col), within the 283x317 image.
ROWCOLS = [
    (0, 0),
    (0, 316),
    (282, 0),
    (282, 316),
    (1, 150),
    (281, 5),
    (140, 0),
    (141, 158),
    (50, 300),
    (200, 100),
    (111, 222),
]


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    from tests.parity.foreign_checkpoints import (
        PyspacerExtractorOracle,
        build_lukemelas_b0,
        save_pyspacer_efficientnet_pt,
    )

    tmp = tmp_path_factory.mktemp("pyspacer")
    pt_path = tmp / "efficientnet.pt"
    model = build_lukemelas_b0(seed=41, feature_dim=4096)
    save_pyspacer_efficientnet_pt(model, pt_path)

    # The repo's REAL ingestion path, from the production-shaped .pt file.
    diff_backbone = _load_diff_backbone()
    sd = diff_backbone.load_state_dict(str(pt_path))
    stripped = strip_module_prefix(sd)
    scheme = detect_naming_scheme(stripped)
    config = EfficientNetConfig(feature_dim=4096, padding="tf_same")
    canonical, applied, dropped = remap_state_dict(stripped, config, scheme)
    variables = torch_state_dict_to_variables(canonical, config)

    from mermaid_classifier_tpu.models.extractor import FeatureExtractor

    extractor = FeatureExtractor(
        variables, config, backbone_batch=8, point_bucket=4
    )
    oracle = PyspacerExtractorOracle(pt_path, feature_dim=4096)
    return {
        "pt_path": pt_path, "model": model, "scheme": scheme,
        "applied": applied, "dropped": dropped, "config": config,
        "extractor": extractor, "oracle": oracle,
    }


class TestProductionCheckpointContainer:
    """The on-disk container is EXACTLY the shape pyspacer load_weights
    reads; the repo ingestion unwraps it without special-casing tests."""

    def test_container_shape(self, fixture):
        payload = torch.load(
            fixture["pt_path"], map_location="cpu", weights_only=True
        )
        assert set(payload) == {"net"}
        keys = list(payload["net"])
        assert keys and all(k.startswith("module.") for k in keys)

    def test_oracle_load_roundtrips_weights(self, fixture):
        from tests.parity.foreign_checkpoints import (
            pyspacer_load_efficientnet,
        )

        net = pyspacer_load_efficientnet(fixture["pt_path"])
        want = fixture["model"].state_dict()
        got = net.state_dict()
        assert set(got) == set(want)
        for key in want:
            assert torch.equal(got[key], want[key]), key

    def test_repo_ingestion_detects_lukemelas(self, fixture):
        assert fixture["scheme"] == "lukemelas"
        assert fixture["applied"]["_fc.weight"] == "feature_projection.weight"

    def test_every_container_key_accounted(self, fixture):
        model_keys = set(fixture["model"].state_dict())
        assert (
            set(fixture["applied"]) | set(fixture["dropped"]) == model_keys
        )


class TestPyspacerLineageExtraction:
    """Image in, features out: the repo pipeline vs the pyspacer oracle."""

    @pytest.fixture(scope="class")
    def features(self, fixture):
        image_pil = _synth_image(seed=9)
        image_np = np.asarray(image_pil)
        rowcols = np.asarray(ROWCOLS, dtype=np.int32)
        ours = fixture["extractor"].extract_features(image_np, rowcols)
        theirs = np.asarray(
            fixture["oracle"].extract_features(image_pil, ROWCOLS),
            dtype=np.float32,
        )
        return ours, theirs

    def test_crop_geometry_matches(self, fixture):
        """The normalized patch tensors themselves agree — crop window,
        zero border, and ImageNet normalization pinned separately from the
        backbone (a backbone bug can't mask a geometry bug here)."""
        from tests.parity.foreign_checkpoints import (
            pyspacer_crop_patches,
            pyspacer_transformation,
        )

        image_pil = _synth_image(seed=9)
        image_np = np.asarray(image_pil)
        rowcols = np.asarray(ROWCOLS, dtype=np.int32)
        ours = np.asarray(
            fixture["extractor"].extract_patches(image_np, rowcols)
        )  # (P, ps, ps, 3) normalized
        pil_patches = pyspacer_crop_patches(image_pil, ROWCOLS)
        theirs = np.stack(
            [
                np.transpose(pyspacer_transformation(p).numpy(), (1, 2, 0))
                for p in pil_patches
            ]
        )
        assert ours.shape == theirs.shape
        mae = float(np.mean(np.abs(ours - theirs)))
        assert mae < 1e-6, f"patch MAE {mae:.2e}"

    def test_end_to_end_feature_mae(self, features):
        ours, theirs = features
        assert ours.shape == theirs.shape == (len(ROWCOLS), 4096)
        mae = float(np.mean(np.abs(ours - theirs)))
        assert mae < FEATURE_TOL, f"feature MAE {mae:.2e} >= {FEATURE_TOL}"

    def test_point_order_preserved(self, fixture, features):
        """Row i of the output is point i: re-extract a permuted point list
        and check the repo rows permute with it (against the oracle)."""
        ours, theirs = features
        perm = [3, 0, 10, 7, 1]
        image_np = np.asarray(_synth_image(seed=9))
        permuted = fixture["extractor"].extract_features(
            image_np, np.asarray([ROWCOLS[i] for i in perm], np.int32)
        )
        np.testing.assert_allclose(
            permuted, theirs[perm], atol=FEATURE_TOL, rtol=0
        )

    def test_corner_point_features_are_distinct(self, features):
        """The corner crops are 3/4 zero border — if the border handling
        were wrong-but-consistent the MAE gate could still pass on interior
        points; require the corner rows to differ from each other and from
        the center row (they see different image content)."""
        ours, _ = features
        corner_ids, center_id = [0, 1, 2, 3], 7
        for i in corner_ids:
            assert not np.allclose(ours[i], ours[center_id], atol=1e-3)
        assert not np.allclose(ours[0], ours[3], atol=1e-3)

    def test_batch_boundary_invariance(self, fixture):
        """pyspacer batches patches in fixed chunks of 10; the repo scans
        chunks of backbone_batch. Feature rows must not depend on where the
        batch boundary falls (13 points crosses both)."""
        image_pil = _synth_image(seed=9)
        image_np = np.asarray(image_pil)
        pts = ROWCOLS + [(77, 77), (210, 300)]
        ours = fixture["extractor"].extract_features(
            image_np, np.asarray(pts, np.int32)
        )
        theirs = np.asarray(
            fixture["oracle"].extract_features(image_pil, pts), np.float32
        )
        mae = float(np.mean(np.abs(ours - theirs)))
        assert mae < FEATURE_TOL, f"feature MAE {mae:.2e}"
