"""Fused-MBConv differential battery: the folded-weight forward must match
the flax backbone, and the Pallas fused blocks (interpreted on the CPU test
backend — identical kernel logic to compiled TPU mode) must match the
folded-XLA reference they replace."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mermaid_classifier_tpu.models.efficientnet import (
    EfficientNetBackbone,
    EfficientNetConfig,
    init_backbone_params,
)
from mermaid_classifier_tpu.ops.fused_mbconv import (
    BlockMeta,
    apply_folded,
    block_metas,
    fold_backbone,
    fusable,
    fused_mbconv,
    _block_xla,
)

# Small-but-real config: every B0 stage topology at 64^2 patches so the
# whole battery runs in seconds on CPU.
CONFIG = EfficientNetConfig(
    compute_dtype="float32", patch_size=64, feature_dim=128
)


@pytest.fixture(scope="module")
def bundle():
    variables = init_backbone_params(0, CONFIG)
    folded = fold_backbone(variables, CONFIG)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
    return variables, folded, x


class TestFoldedForward:
    def test_matches_flax_backbone(self, bundle):
        variables, folded, x = bundle
        ref = np.asarray(EfficientNetBackbone(config=CONFIG).apply(variables, x))
        got = np.asarray(apply_folded(folded, CONFIG, x, fused=False))
        rel = np.abs(ref - got).max() / np.abs(ref).max()
        assert rel < 1e-5, rel

    def test_odd_spatial_transitions(self):
        """Stride-2 with symmetric padding emits ceil(h/2); odd
        intermediate sizes (every b1-b3 resolution hits some) must flow
        through block_metas, the folded forward, AND the fused kernels
        without geometry drift vs flax."""
        from dataclasses import replace

        cfg = replace(CONFIG, patch_size=60)  # 60 -> 30 -> 15 -> 8 -> 4 -> 2
        variables = init_backbone_params(0, cfg)
        metas = block_metas(cfg)
        assert {m.h for m in metas} >= {30, 15, 8}
        folded = fold_backbone(variables, cfg)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, 60, 60, 3)).astype(np.float32))
        ref = np.asarray(EfficientNetBackbone(config=cfg).apply(variables, x))
        for kw in ({}, {"fused": True, "interpret": True}):
            got = np.asarray(apply_folded(folded, cfg, x, **kw))
            rel = np.abs(ref - got).max() / np.abs(ref).max()
            assert rel < 1e-5, (kw, rel)

    def test_int8_weight_quantization_tracks_folded(self, bundle):
        """quantize_folded (w8a32) must track the f32 folded path, and the
        bundle must actually store int8.

        Per-BLOCK comparison on O(1) inputs: a full random-init trunk
        decays activations to ~1e-7 where cosine is pure noise — the
        full-trunk verdict belongs to the on-chip gate (trunk_ab +w8 runs
        the 0.999-cosine device check on the production geometry)."""
        from mermaid_classifier_tpu.ops.fused_mbconv import (
            _block_xla,
            quantize_folded,
        )

        variables, folded, x = bundle
        quantized = quantize_folded(folded)
        # Weights really are int8 + f32 per-channel scales.
        w_q, scale, b = quantized["stem"]
        assert w_q.dtype == np.int8
        assert scale.dtype == np.float32 and b.dtype == np.float32
        assert all(len(blk["project"]) == 3 for blk in quantized["blocks"])

        rng = np.random.default_rng(3)
        dtype = jnp.float32
        for blk, q_blk in zip(folded["blocks"], quantized["blocks"]):
            meta = blk["meta"]
            z = jnp.asarray(
                rng.standard_normal(
                    (2, meta.h, meta.w, meta.in_channels)
                ).astype(np.float32)
            )
            ref = np.asarray(_block_xla(z, blk, dtype))
            got = np.asarray(_block_xla(z, q_blk, dtype))
            denom = float(np.abs(ref).max())
            rel = float(np.abs(ref - got).max()) / max(denom, 1e-12)
            # int8 per-channel weights: ~0.4% max relative error per
            # block is the expected quantization step noise.
            assert rel < 0.02, (meta, rel)

        # A shallow trunk (healthy activation magnitudes) passes the same
        # 0.999-cosine bar the device gate applies.
        from dataclasses import replace

        shallow = replace(
            CONFIG, stages=CONFIG.stages[:3], feature_dim=64, patch_size=32
        )
        s_vars = init_backbone_params(1, shallow)
        s_folded = fold_backbone(s_vars, shallow)
        s_quant = quantize_folded(s_folded)
        xs = jnp.asarray(
            rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
        )
        ref = np.asarray(apply_folded(s_folded, shallow, xs))
        got = np.asarray(apply_folded(s_quant, shallow, xs))
        num = np.sum(ref * got, axis=1)
        den = np.linalg.norm(ref, axis=1) * np.linalg.norm(got, axis=1)
        worst = float(np.min(num / np.maximum(den, 1e-12)))
        assert worst >= 0.999, worst

    def test_dequant_is_exact_for_representable_weights(self):
        """Weights that are exact int8 multiples of the scale round-trip
        bit-exactly through _quantize_wb + _wb."""
        from mermaid_classifier_tpu.ops.fused_mbconv import _quantize_wb, _wb

        # Each output channel's absmax is exactly 127 * step, so the
        # per-channel scale is the step and every entry is an exact int8
        # multiple of it.
        step = 0.03125
        w = np.vstack(
            [np.full(127, -127.0, np.float32), np.arange(127, dtype=np.float32)]
        ) * step
        b = np.zeros(127, np.float32)
        w_q, scale, _ = _quantize_wb((w, b))
        restored, _ = _wb((w_q, scale, b), jnp.float32)
        np.testing.assert_allclose(np.asarray(restored), w, rtol=1e-6)

    def test_block_metas_cover_all_blocks(self):
        metas = block_metas(CONFIG)
        assert len(metas) == sum(s[2] for s in CONFIG.stages)
        # Stride-2 blocks halve the following block's spatial extent.
        assert metas[1].stride == 2 and metas[2].h == metas[1].h // 2
        # Every fusable block is stride-1 with an expansion.
        for m in metas:
            if fusable(m):
                assert m.stride == 1 and m.has_expand


class TestAlternativeSchedules:
    """The tap-sum depthwise and im2col stem are pure reschedules of the
    same math (the measured v5e wins live in docs/perf_roofline.md);
    every combination must agree with the native-conv folded forward."""

    @pytest.mark.parametrize(
        "kw",
        [
            {"dw_taps_kernels": (5,), "stem_im2col": False},
            {"dw_taps_kernels": (3, 5), "stem_im2col": False},
            {"dw_taps_kernels": (), "stem_im2col": True},
            {"dw_taps_kernels": (3, 5), "stem_im2col": True},
        ],
    )
    def test_matches_native_schedules(self, bundle, kw):
        _, folded, x = bundle
        ref = np.asarray(
            apply_folded(
                folded, CONFIG, x, dw_taps_kernels=(), stem_im2col=False
            )
        )
        got = np.asarray(apply_folded(folded, CONFIG, x, **kw))
        rel = np.abs(ref - got).max() / np.abs(ref).max()
        assert rel < 1e-5, (kw, rel)

    def test_taps_cover_stride2_blocks(self, bundle):
        """Both k=5 geometries include a stride-2 block; the tap-sum path
        must reproduce it (strided static slices)."""
        _, folded, _ = bundle
        from mermaid_classifier_tpu.ops.fused_mbconv import _dw_taps

        rng = np.random.default_rng(6)
        for blk in folded["blocks"]:
            meta: BlockMeta = blk["meta"]
            if meta.stride != 2:
                continue
            z = jnp.asarray(
                rng.standard_normal(
                    (2, meta.h, meta.w, meta.mid_channels)
                ).astype(np.float32)
            )
            w_dw, b_dw = blk["depthwise"]
            p = (meta.kernel - 1) // 2
            ref = jax.lax.conv_general_dilated(
                z,
                w_dw[:, :, :, None].transpose(0, 1, 3, 2),
                window_strides=(2, 2),
                padding=((p, p), (p, p)),
                feature_group_count=meta.mid_channels,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ) + b_dw
            got = _dw_taps(z, w_dw, b_dw, meta.kernel, meta.stride)
            rel = (
                np.abs(np.asarray(ref) - np.asarray(got)).max()
                / np.abs(np.asarray(ref)).max()
            )
            assert rel < 1e-5, (meta, rel)


class TestFusedKernel:
    def test_full_forward_matches_folded(self, bundle):
        _, folded, x = bundle
        ref = np.asarray(apply_folded(folded, CONFIG, x, fused=False))
        got = np.asarray(
            apply_folded(folded, CONFIG, x, fused=True, interpret=True)
        )
        rel = np.abs(ref - got).max() / np.abs(ref).max()
        assert rel < 1e-5, rel

    @pytest.mark.parametrize("block_b", [1, 2, 4])
    def test_single_blocks_match_xla(self, bundle, block_b):
        """Every fusable geometry (k=3/k=5, residual and not, 16^2..2^2)
        through the kernel vs the XLA block, at several patch groupings."""
        _, folded, x = bundle
        rng = np.random.default_rng(2)
        seen = set()
        for blk in folded["blocks"]:
            meta: BlockMeta = blk["meta"]
            if not fusable(meta):
                continue
            key = (meta.kernel, meta.residual, meta.h, meta.in_channels)
            if key in seen:
                continue
            seen.add(key)
            xin = jnp.asarray(
                rng.standard_normal(
                    (4, meta.h, meta.w, meta.in_channels)
                ).astype(np.float32)
            )
            ref = np.asarray(_block_xla(xin, blk, jnp.float32))
            got = np.asarray(
                fused_mbconv(xin, blk, block_b=block_b, interpret=True)
            )
            rel = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-12)
            assert rel < 1e-5, (key, rel)
        assert seen, "no fusable blocks exercised"

    def test_flat_padded_layout_matches_masked(self, bundle):
        """The maskless (zero-columns-between-rows) depthwise layout and
        the masked compact layout are alternative schedules of the same
        math; both must reproduce the XLA block."""
        _, folded, _ = bundle
        rng = np.random.default_rng(4)
        checked = 0
        for blk in folded["blocks"]:
            meta: BlockMeta = blk["meta"]
            if not fusable(meta) or meta.h > 8:
                continue
            xin = jnp.asarray(
                rng.standard_normal(
                    (2, meta.h, meta.w, meta.in_channels)
                ).astype(np.float32)
            )
            ref = np.asarray(_block_xla(xin, blk, jnp.float32))
            got = np.asarray(
                fused_mbconv(
                    xin, blk, dw_layout="flat_padded", interpret=True
                )
            )
            rel = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-12)
            assert rel < 1e-5, (meta, rel)
            checked += 1
        assert checked >= 3

    def test_bfloat16_accumulator_close_to_float32(self, bundle):
        """acc_dtype=bfloat16 halves depthwise accumulator traffic; its
        drift vs the f32 accumulator must stay at bf16-rounding scale on
        a single block (the production gate arbitrates the full trunk)."""
        _, folded, _ = bundle
        blk = next(
            b for b in folded["blocks"]
            if fusable(b["meta"]) and b["meta"].kernel == 5
        )
        meta = blk["meta"]
        rng = np.random.default_rng(5)
        xin = jnp.asarray(
            rng.standard_normal(
                (2, meta.h, meta.w, meta.in_channels)
            ).astype(np.float32),
            dtype=jnp.bfloat16,
        )
        ref = np.asarray(
            fused_mbconv(xin, blk, acc_dtype=jnp.float32, interpret=True),
            dtype=np.float32,
        )
        got = np.asarray(
            fused_mbconv(xin, blk, acc_dtype=jnp.bfloat16, interpret=True),
            dtype=np.float32,
        )
        rel = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-12)
        assert rel < 0.05, rel

    def test_rejects_stride2(self, bundle):
        _, folded, x = bundle
        blk = next(
            b for b in folded["blocks"] if b["meta"].stride == 2
        )
        xin = jnp.zeros((1, blk["meta"].h, blk["meta"].w, blk["meta"].in_channels))
        with pytest.raises(ValueError, match="stride-1"):
            fused_mbconv(xin, blk)

    def test_bfloat16_single_block_tracks_xla(self, bundle):
        """Per-block bfloat16 check: the fused kernel and the XLA block
        must agree to bf16 rounding on the same block. (Whole-trunk bf16
        comparisons are meaningless at this toy scale — 16 random-weight
        blocks amplify bf16 noise until ANY two bf16 paths decorrelate,
        including folded-XLA vs flax. The absolute 0.999 cosine gate is a
        production-scale property, enforced on-chip by
        FeatureExtractor.verify_device_numerics and reported by bench.py.)"""
        _, folded, _ = bundle
        rng = np.random.default_rng(3)
        checked = 0
        for blk in folded["blocks"]:
            meta: BlockMeta = blk["meta"]
            if not fusable(meta):
                continue
            xin = jnp.asarray(
                rng.standard_normal(
                    (2, meta.h, meta.w, meta.in_channels)
                ).astype(np.float32),
                dtype=jnp.bfloat16,
            )
            ref = np.asarray(
                _block_xla(xin, blk, jnp.bfloat16), dtype=np.float32
            )
            got = np.asarray(
                fused_mbconv(xin, blk, interpret=True), dtype=np.float32
            )
            rel = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-12)
            assert rel < 0.05, (meta, rel)
            checked += 1
        assert checked >= 5

    def test_folded_bundle_crosses_jit_boundary(self, bundle):
        """BlockMeta registers as a static pytree node, so a folded bundle
        can be a jit argument (weights as device arrays, metas static)."""
        _, folded, x = bundle
        df = jax.tree.map(jnp.asarray, folded)

        @jax.jit
        def fwd(f, x):
            return apply_folded(f, CONFIG, x, fused=False)

        ref = np.asarray(apply_folded(folded, CONFIG, x, fused=False))
        got = np.asarray(fwd(df, x))
        assert np.allclose(ref, got, atol=1e-5)


class TestPrefixSuffixSplit:
    """apply_folded_suffix(apply_folded_prefix(x, k), k) must equal
    apply_folded(x) at every split point (the two-phase schedule seam)."""

    def test_split_equals_full(self):
        import jax
        import numpy as np

        from mermaid_classifier_tpu.models.efficientnet import (
            EfficientNetConfig,
            init_backbone_params,
        )
        from mermaid_classifier_tpu.ops.fused_mbconv import (
            apply_folded,
            apply_folded_prefix,
            apply_folded_suffix,
            fold_backbone,
        )

        config = EfficientNetConfig(
            stem_channels=8,
            stages=((1, 8, 1, 1, 3), (6, 16, 2, 2, 5), (6, 24, 1, 2, 3)),
            head_channels=32,
            feature_dim=48,
            patch_size=32,
        )
        variables = init_backbone_params(0, config)
        folded = fold_backbone(variables, config)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
        full = np.asarray(jax.jit(
            lambda v, x: apply_folded(v, config, x)
        )(folded, x))
        n_total = len(folded["blocks"])
        for k in (0, 1, 2, n_total):
            got = np.asarray(apply_folded_suffix(
                folded, config,
                apply_folded_prefix(folded, config, x, k), k,
            ))
            np.testing.assert_allclose(got, full, atol=1e-5, rtol=1e-5,
                                       err_msg=f"split at {k}")
