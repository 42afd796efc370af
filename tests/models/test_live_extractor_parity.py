"""Opt-in LIVE extractor gate: real image + real pyspacer-produced
features -> this framework's extractor must reproduce them, INCLUDING
points near the image border (the crop border policy,
docs/release_fidelity_runbook.md step 3; PARITY.md "Patch-crop border
policy").

Skipped by default (CI stays synthetic/offline). To run, point the env
vars at production data:

  LIVE_EXTRACTOR_IMAGE    — the source image file (any PIL-readable format)
  LIVE_EXTRACTOR_FEATURES — the pyspacer-lineage features for that image as
                            a .features.npz (rowcols + features; convert
                            legacy JSON with scripts/extract_reference_features.py)
  LIVE_BACKBONE_WEIGHTS   — the converted backbone npz
                            (scripts/diff_backbone.py --save-npz writes it
                            with the padding/bn_eps sidecar)

The fixture MUST include at least one border point (within patch_size//2
of an image edge) — that is the case the offline suite cannot
differentiate: pyspacer zero-pads before cropping (spacer 0.14.0,
spacer/extract_features_utils.py crop_patches: PIL ImageOps.expand
zero-fill + crop at center - crop_size//2; pinned by the reference's
uv.lock:1693), and this framework does the same
(ops/patch_ops.py, models/extractor.py), but only a live fixture proves
the real pipeline end to end.
"""

import os

import numpy as np
import pytest

LIVE_IMAGE = "LIVE_EXTRACTOR_IMAGE"
LIVE_FEATURES = "LIVE_EXTRACTOR_FEATURES"
LIVE_WEIGHTS = "LIVE_BACKBONE_WEIGHTS"

FEATURE_MAE_TOL = 1e-4  # the BASELINE.md fidelity contract


class TestLiveExtractorParity:
    def test_live_features_reproduce_including_border_points(self):
        image_path = os.environ.get(LIVE_IMAGE)
        features_path = os.environ.get(LIVE_FEATURES)
        weights_path = os.environ.get(LIVE_WEIGHTS)
        if not (image_path and features_path and weights_path):
            pytest.skip(
                f"set {LIVE_IMAGE}, {LIVE_FEATURES}, {LIVE_WEIGHTS} to run"
                " the live extractor gate"
            )

        from PIL import Image

        from mermaid_classifier_tpu.data.features_io import read_feature_file
        from mermaid_classifier_tpu.models.convert import load_backbone_bundle
        from mermaid_classifier_tpu.models.extractor import build_extractor

        image = np.asarray(Image.open(image_path).convert("RGB"))
        rowcols, want = read_feature_file(features_path)
        weights, config = load_backbone_bundle(weights_path)
        assert config is not None, (
            f"{weights_path} has no .config.json sidecar; convert with"
            " scripts/diff_backbone.py --save-npz so the padding/bn_eps"
            " lineage decision ships with the weights"
        )

        extractor = build_extractor(weights, config=config)
        got = np.asarray(
            extractor.extract_features(image, rowcols), np.float32
        )
        assert got.shape == want.shape

        ps_half = config.patch_size // 2
        h, w = image.shape[:2]
        is_border = (
            (rowcols[:, 0] < ps_half)
            | (rowcols[:, 1] < ps_half)
            | (rowcols[:, 0] >= h - ps_half)
            | (rowcols[:, 1] >= w - ps_half)
        )
        assert bool(is_border.any()), (
            "the live fixture has no border points (within"
            f" {ps_half}px of an edge) — the border crop policy is exactly"
            " what this gate exists to prove; regenerate the fixture from"
            " an image with at least one edge annotation"
        )

        mae_all = float(np.mean(np.abs(got - want)))
        mae_border = float(
            np.mean(np.abs(got[is_border] - want[is_border]))
        )
        mae_interior = (
            float(np.mean(np.abs(got[~is_border] - want[~is_border])))
            if bool((~is_border).any())
            else None
        )
        print(
            f"live extractor parity: overall MAE {mae_all:.2e},"
            f" border ({int(is_border.sum())} pts) {mae_border:.2e},"
            f" interior {mae_interior}"
        )
        assert mae_all <= FEATURE_MAE_TOL
        assert mae_border <= FEATURE_MAE_TOL, (
            "border points diverge while the overall MAE may pass — the"
            " zero-pad crop policy does not match the fixture's producer"
        )
