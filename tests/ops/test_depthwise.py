"""Differential: the Pallas k5 depthwise kernel vs the native XLA
depthwise conv — identical math contract (stride-1 SAME, bias, f32
accumulation) on every trunk geometry it targets."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mermaid_classifier_tpu.ops.depthwise import depthwise_conv_pallas

# (H, C) geometries of the trunk's stride-1 k5 blocks (stages 2/4/5 at
# B0's 224 resolution) plus odd-size maps from the b1-b3 presets.
GEOMETRIES = [
    (28, 240, 5),
    (14, 672, 5),
    (7, 1152, 5),
    (15, 672, 5),   # odd map (b-variant resolutions)
    (14, 480, 3),   # k3 sanity
]


def _xla_depthwise(x, w_dw, b_dw, k):
    p = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        jnp.asarray(w_dw, jnp.float32).transpose(0, 1, 2)[:, :, :, None]
        .transpose(0, 1, 3, 2),
        window_strides=(1, 1),
        padding=((p, p), (p, p)),
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + jnp.asarray(b_dw, jnp.float32)


class TestDepthwisePallas:
    @pytest.mark.parametrize("h,c,k", GEOMETRIES)
    def test_matches_native_conv(self, h, c, k):
        rng = np.random.default_rng(h * c + k)
        x = rng.standard_normal((4, h, h, c)).astype(np.float32)
        w = (rng.standard_normal((k, k, c)) * 0.2).astype(np.float32)
        b = rng.standard_normal(c).astype(np.float32)
        got = depthwise_conv_pallas(
            jnp.asarray(x), w, b, kernel=k, interpret=True
        )
        want = _xla_depthwise(jnp.asarray(x), w, b, k)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
        )

    def test_bf16_activation_f32_accumulation(self):
        rng = np.random.default_rng(0)
        h, c, k = 14, 672, 5
        x = rng.standard_normal((2, h, h, c)).astype(np.float32)
        w = (rng.standard_normal((k, k, c)) * 0.2).astype(np.float32)
        b = rng.standard_normal(c).astype(np.float32)
        got = depthwise_conv_pallas(
            jnp.asarray(x, jnp.bfloat16), w, b, kernel=k, interpret=True
        )
        assert got.dtype == jnp.bfloat16
        want = _xla_depthwise(
            jnp.asarray(x, jnp.bfloat16).astype(jnp.float32), w, b, k
        )
        # bf16 in / f32 accumulate: agreement to bf16 rounding of the
        # f32 result.
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want),
            atol=0.1, rtol=0.02,
        )

    def test_block_b_divides_batch(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((6, 7, 7, 256)).astype(np.float32)
        w = (rng.standard_normal((5, 5, 256)) * 0.2).astype(np.float32)
        b = np.zeros(256, np.float32)
        got = depthwise_conv_pallas(
            jnp.asarray(x), w, b, kernel=5, block_b=4, interpret=True
        )
        want = _xla_depthwise(jnp.asarray(x), w, b, 5)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
        )
