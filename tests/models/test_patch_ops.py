"""Patch crop+normalize correctness: XLA path vs numpy oracle vs Pallas
kernel (interpreted on the CPU test backend — identical kernel logic)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mermaid_classifier_tpu.experiments.pallas_crop import (
    extract_patches_pallas,
    make_affine_rows,
)
from mermaid_classifier_tpu.ops.patch_ops import (
    channel_scale_bias,
    extract_patches_xla,
    pad_image,
)

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def numpy_oracle(image, rowcols, ps, mean=MEAN, std=STD):
    """Straight-line numpy crop+normalize: zeros outside the image."""
    h, w, _ = image.shape
    half = ps // 2
    out = np.zeros((len(rowcols), ps, ps, 3), np.float32)
    for i, (r, c) in enumerate(rowcols):
        for dr in range(ps):
            for dc in range(ps):
                rr, cc = r - half + dr, c - half + dc
                if 0 <= rr < h and 0 <= cc < w:
                    out[i, dr, dc] = image[rr, cc]
    out = (out / 255.0 - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return out.astype(np.float32)


@pytest.fixture(scope="module")
def small_case():
    rng = np.random.default_rng(0)
    ps = 16
    image = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    rowcols = np.array(
        [
            [20, 28],  # interior
            [0, 0],  # corner: 3 quadrants zero-padded
            [39, 55],  # opposite corner
            [4, 50],  # edge
        ],
        np.int32,
    )
    return image, rowcols, ps


class TestXLAPath:
    def test_matches_numpy_oracle(self, small_case):
        image, rowcols, ps = small_case
        scale, bias = channel_scale_bias(MEAN, STD)
        padded = pad_image(jnp.asarray(image), ps)
        got = np.asarray(
            extract_patches_xla(
                padded, jnp.asarray(rowcols), ps, jnp.asarray(scale), jnp.asarray(bias)
            )
        )
        expected = numpy_oracle(image, rowcols, ps)
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_boundary_zeros_are_normalized_zeros(self, small_case):
        image, _, ps = small_case
        scale, bias = channel_scale_bias(MEAN, STD)
        padded = pad_image(jnp.asarray(image), ps)
        got = np.asarray(
            extract_patches_xla(
                padded,
                jnp.asarray([[0, 0]], jnp.int32),
                ps,
                jnp.asarray(scale),
                jnp.asarray(bias),
            )
        )
        # Top-left quadrant comes from zero padding: value = 0*scale + bias.
        half = ps // 2
        np.testing.assert_allclose(got[0, 0, 0], bias, atol=1e-7)
        # Center pixel is the real image pixel.
        expected_center = (image[0, 0] / 255.0 - np.asarray(MEAN)) / np.asarray(STD)
        np.testing.assert_allclose(got[0, half, half], expected_center, atol=1e-6)


class TestPallasKernel:
    def test_matches_xla_path(self, small_case):
        image, rowcols, ps = small_case
        scale, bias = channel_scale_bias(MEAN, STD)
        padded = pad_image(jnp.asarray(image), ps)
        xla_out = np.asarray(
            extract_patches_xla(
                padded, jnp.asarray(rowcols), ps, jnp.asarray(scale), jnp.asarray(bias)
            )
        )
        scale_row, bias_row = make_affine_rows(scale, bias, ps)
        pallas_out = np.asarray(
            extract_patches_pallas(
                padded,
                jnp.asarray(rowcols),
                ps,
                jnp.asarray(scale_row),
                jnp.asarray(bias_row),
                interpret=True,
            )
        )
        np.testing.assert_allclose(pallas_out, xla_out, atol=1e-6)

    def test_many_points(self):
        rng = np.random.default_rng(1)
        ps = 8
        image = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        rowcols = np.stack(
            [rng.integers(0, 64, 25), rng.integers(0, 64, 25)], axis=1
        ).astype(np.int32)
        scale, bias = channel_scale_bias(MEAN, STD)
        padded = pad_image(jnp.asarray(image), ps)
        scale_row, bias_row = make_affine_rows(scale, bias, ps)
        got = np.asarray(
            extract_patches_pallas(
                padded,
                jnp.asarray(rowcols),
                ps,
                jnp.asarray(scale_row),
                jnp.asarray(bias_row),
                interpret=True,
            )
        )
        expected = numpy_oracle(image, rowcols, ps)
        np.testing.assert_allclose(got, expected, atol=1e-6)
