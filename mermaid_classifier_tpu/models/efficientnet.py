"""EfficientNet-B0 feature backbone in Flax.

TPU-native replacement for the reference's pretrained torch EfficientNet
(``efficientnet.pt``) that turns a 224x224 patch into a feature vector
(reference: scripts/build_feature_bucket.py:375-448, settings.py:7-8).
The network is inference-only here — the backbone is a fixed pretrained
artifact in the production pipeline; head training happens on precomputed
features.

Architecture notes:
- Canonical B0 stage layout (MBConv expand/kernel/stride/repeats), SE ratio
  0.25, SiLU activations, BatchNorm eps 1e-3 with running stats
  (``bn_eps`` configurable: lukemelas/TF lineages use 1e-3, raw
  torchvision checkpoints 1e-5).
- Two spatial padding modes (``config.padding``): "symmetric"
  p=(k-1)//2 everywhere (torchvision-style, the default) and "tf_same"
  (TensorFlow SAME semantics — asymmetric lo/hi for stride-2 convs at
  even sizes, what lukemelas/EfficientNet-PyTorch static same-padding
  does). The reference's production extractor is pyspacer, whose vendored
  EfficientNet is lukemelas-lineage — REAL ``efficientnet.pt`` weights
  need ``padding="tf_same"`` to hit the <1e-4 feature MAE contract
  (tests/parity/test_foreign_checkpoint_fidelity.py proves both that
  tf_same reproduces and that symmetric does NOT). Output sizes are
  identical in both modes (ceil(in/stride)), so the rest of the pipeline
  is mode-agnostic.
- The trunk pools to 1280 dims; the extractor contract is ``feature_dim``
  floats per patch (production default 4096, reference: settings.py:7-8),
  produced by a final projection layer. When converting real production
  weights, the converter maps whatever layer emits the 4096-dim output onto
  this projection.
- Everything is fixed-shape and jit/vmap/shard_map friendly; batch-norm uses
  running averages so the whole forward is a pure function of (params, x).
"""

from __future__ import annotations

import dataclasses
from collections.abc import Sequence
from dataclasses import dataclass, field

import flax.linen as nn
import jax.numpy as jnp

# (expand_ratio, channels, repeats, stride, kernel_size) per stage — B0.
B0_STAGES: tuple[tuple[int, int, int, int, int], ...] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

BN_EPS = 1e-3
BN_MOMENTUM = 0.99


@dataclass(frozen=True)
class EfficientNetConfig:
    stem_channels: int = 32
    stages: tuple[tuple[int, int, int, int, int], ...] = B0_STAGES
    head_channels: int = 1280
    se_ratio: float = 0.25
    # Computation dtype for the conv trunk ("float32" or "bfloat16").
    # Parameters stay float32 either way; bfloat16 halves HBM traffic and
    # runs the MXU single-pass, at a fidelity cost that must pass the
    # device-numerics cosine gate (extractor.verify_device_numerics) —
    # the production parity path (<1e-4 MAE, BASELINE.md) stays float32.
    # The final pool + feature projection always compute in float32.
    compute_dtype: str = "float32"
    # Output feature dimensionality per patch. 4096 is the production
    # contract (reference: settings.py:7-8); 1280 means "raw pooled trunk,
    # no projection".
    feature_dim: int = 4096
    # ImageNet preprocessing constants applied by the patch pipeline.
    mean_rgb: tuple[float, float, float] = (0.485, 0.456, 0.406)
    std_rgb: tuple[float, float, float] = (0.229, 0.224, 0.225)
    patch_size: int = 224
    # Spatial padding semantics: "symmetric" (p=(k-1)//2 both sides,
    # torchvision-style) or "tf_same" (TensorFlow SAME — asymmetric at
    # stride-2 even sizes; lukemelas/pyspacer lineage). See conv_padding.
    padding: str = "symmetric"
    # BatchNorm epsilon. 1e-3 matches the TF/lukemelas/pyspacer lineage
    # (the reference's production weights); raw torchvision B0 checkpoints
    # were trained with torch's default 1e-5.
    bn_eps: float = BN_EPS

    def to_dict(self) -> dict:
        return {
            "stem_channels": self.stem_channels,
            "stages": [list(s) for s in self.stages],
            "head_channels": self.head_channels,
            "se_ratio": self.se_ratio,
            "feature_dim": self.feature_dim,
            "mean_rgb": list(self.mean_rgb),
            "std_rgb": list(self.std_rgb),
            "patch_size": self.patch_size,
            "compute_dtype": self.compute_dtype,
            "padding": self.padding,
            "bn_eps": self.bn_eps,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "EfficientNetConfig":
        """Config from a (possibly partial) dict: absent fields take the
        dataclass defaults, so sidecar configs written before a new field
        existed — and hand-written test/drive configs — keep loading.
        Unknown keys are rejected loudly: a typo'd field silently falling
        back to a default would change numerics without a trace."""
        unknown = set(d) - {f.name for f in dataclasses.fields(cls)}
        if unknown:
            raise ValueError(
                f"unknown EfficientNetConfig fields: {sorted(unknown)}"
            )
        kwargs = dict(d)
        if "stages" in kwargs:
            kwargs["stages"] = tuple(tuple(s) for s in kwargs["stages"])
        for key in ("mean_rgb", "std_rgb"):
            if key in kwargs:
                kwargs[key] = tuple(kwargs[key])
        return cls(**kwargs)


def _round_filters(channels: int, width_mult: float) -> int:
    """EfficientNet compound-scaling filter rounding: scale by the width
    multiplier, snap to a multiple of 8, never drop below 90% of the
    scaled value (the standard round_filters rule)."""
    if width_mult == 1.0:
        return channels
    scaled = channels * width_mult
    new = max(8, int(scaled + 4) // 8 * 8)
    if new < 0.9 * scaled:
        new += 8
    return new


def _round_repeats(repeats: int, depth_mult: float) -> int:
    import math

    return int(math.ceil(depth_mult * repeats))


# (width_mult, depth_mult, resolution) per variant — the published
# EfficientNet compound-scaling coefficients.
VARIANT_COEFFS: dict[str, tuple[float, float, int]] = {
    "b0": (1.0, 1.0, 224),
    "b1": (1.0, 1.1, 240),
    "b2": (1.1, 1.2, 260),
    "b3": (1.2, 1.4, 300),
    "b4": (1.4, 1.8, 380),
    "b5": (1.6, 2.2, 456),
    "b6": (1.8, 2.6, 528),
    "b7": (2.0, 3.1, 600),
}


def variant_config(
    variant: str = "b0",
    *,
    feature_dim: int = 4096,
    compute_dtype: str = "float32",
) -> EfficientNetConfig:
    """EfficientNetConfig for a compound-scaled variant (b0..b7).

    The production contract is B0 (the reference ships a B0 extractor —
    scripts/build_feature_bucket.py:375-448); larger variants are the
    framework's growth path: everything downstream (extractor, artifact
    config round trip, converter) is shape-generic, so a variant swap is
    a config swap. patch_size follows the variant's native resolution.
    """
    key = variant.lower().removeprefix("efficientnet").lstrip("-_")
    if key not in VARIANT_COEFFS:
        raise ValueError(
            f"unknown EfficientNet variant {variant!r};"
            f" supported: {sorted(VARIANT_COEFFS)}"
        )
    w, d, res = VARIANT_COEFFS[key]
    stages = tuple(
        (
            expand,
            _round_filters(out_ch, w),
            _round_repeats(repeats, d),
            stride,
            kernel,
        )
        for expand, out_ch, repeats, stride, kernel in B0_STAGES
    )
    return EfficientNetConfig(
        stem_channels=_round_filters(32, w),
        stages=stages,
        head_channels=_round_filters(1280, w),
        feature_dim=feature_dim,
        patch_size=res,
        compute_dtype=compute_dtype,
    )


def conv_padding(
    kernel: int, stride: int, in_h: int, in_w: int, mode: str = "symmetric"
) -> Sequence[tuple[int, int]]:
    """Per-dim (lo, hi) spatial padding for a conv.

    "symmetric": p=(k-1)//2 on both sides (torchvision-style).
    "tf_same": TensorFlow SAME — total = max((ceil(in/s)-1)*s + k - in, 0),
    split lo = total//2, hi = total - lo, so stride-2 convs at even sizes
    pad MORE on the bottom/right (what lukemelas Conv2dStaticSamePadding
    does, and what the reference's pyspacer-vendored extractor runs).
    Both modes emit ceil(in/stride) outputs.
    """
    if mode == "symmetric":
        p = (kernel - 1) // 2
        return ((p, p), (p, p))
    if mode == "tf_same":
        pads = []
        for size in (in_h, in_w):
            out = -(-size // stride)
            total = max((out - 1) * stride + kernel - size, 0)
            lo = total // 2
            pads.append((lo, total - lo))
        return tuple(pads)
    raise ValueError(
        f"unknown padding mode {mode!r}; expected 'symmetric' or 'tf_same'"
    )


def _same_pad(kernel: int) -> Sequence[tuple[int, int]]:
    p = (kernel - 1) // 2
    return ((p, p), (p, p))


class ConvBNAct(nn.Module):
    """Conv -> BatchNorm(running stats) -> optional SiLU."""

    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32
    padding_mode: str = "symmetric"
    bn_eps: float = BN_EPS

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            # Shapes are static under jit, so the (lo, hi) pads are trace-
            # time constants even in tf_same mode.
            padding=conv_padding(
                self.kernel, self.stride, x.shape[1], x.shape[2],
                self.padding_mode,
            ),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True,
            epsilon=self.bn_eps,
            momentum=BN_MOMENTUM,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act:
            x = nn.silu(x)
        return x


class SqueezeExcite(nn.Module):
    """SE block: global pool -> reduce(SiLU) -> expand(sigmoid) -> scale."""

    channels: int
    se_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(
            self.se_channels, (1, 1), use_bias=True, dtype=self.dtype,
            name="reduce",
        )(s)
        s = nn.silu(s)
        s = nn.Conv(
            self.channels, (1, 1), use_bias=True, dtype=self.dtype,
            name="expand",
        )(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    """Mobile inverted bottleneck with SE and residual."""

    in_channels: int
    out_channels: int
    expand_ratio: int
    kernel: int
    stride: int
    se_ratio: float
    dtype: jnp.dtype = jnp.float32
    padding_mode: str = "symmetric"
    bn_eps: float = BN_EPS

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp = x
        mid = self.in_channels * self.expand_ratio
        if self.expand_ratio != 1:
            x = ConvBNAct(
                mid, kernel=1, dtype=self.dtype, bn_eps=self.bn_eps,
                name="expand",
            )(x)
        x = ConvBNAct(
            mid, kernel=self.kernel, stride=self.stride, groups=mid,
            dtype=self.dtype, padding_mode=self.padding_mode,
            bn_eps=self.bn_eps, name="depthwise",
        )(x)
        se_channels = max(1, int(self.in_channels * self.se_ratio))
        x = SqueezeExcite(mid, se_channels, dtype=self.dtype, name="se")(x)
        x = ConvBNAct(
            self.out_channels, kernel=1, act=False, dtype=self.dtype,
            bn_eps=self.bn_eps, name="project",
        )(x)
        if self.stride == 1 and self.in_channels == self.out_channels:
            x = x + inp
        return x


class EfficientNetBackbone(nn.Module):
    """Stem -> MBConv stages -> head conv -> global average pool ->
    feature projection. Input is a normalized (N, H, W, 3) float32 batch;
    output is (N, feature_dim) float32."""

    config: EfficientNetConfig = field(default_factory=EfficientNetConfig)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        x = x.astype(dtype)
        x = ConvBNAct(
            cfg.stem_channels, kernel=3, stride=2, dtype=dtype,
            padding_mode=cfg.padding, bn_eps=cfg.bn_eps, name="stem",
        )(x)
        in_ch = cfg.stem_channels
        for stage_idx, (expand, out_ch, repeats, stride, kernel) in enumerate(
            cfg.stages
        ):
            for block_idx in range(repeats):
                x = MBConv(
                    in_channels=in_ch,
                    out_channels=out_ch,
                    expand_ratio=expand,
                    kernel=kernel,
                    stride=stride if block_idx == 0 else 1,
                    se_ratio=cfg.se_ratio,
                    dtype=dtype,
                    padding_mode=cfg.padding,
                    bn_eps=cfg.bn_eps,
                    name=f"stage{stage_idx}_block{block_idx}",
                )(x)
                in_ch = out_ch
        x = ConvBNAct(
            cfg.head_channels, kernel=1, dtype=dtype, bn_eps=cfg.bn_eps,
            name="head",
        )(x)
        # Pool + projection in float32 regardless of trunk dtype: the 4096-dim
        # output is the artifact contract, and the final matmul is cheap.
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if cfg.feature_dim != cfg.head_channels:
            x = nn.Dense(cfg.feature_dim, name="feature_projection")(x)
        return x


def init_backbone_params(rng_key_or_seed, config: EfficientNetConfig | None = None):
    """Initialize (params + batch_stats) variables for the backbone.

    Used for tests/bench and as the fallback when no pretrained weights are
    provided. Shapes come from ``jax.eval_shape`` (pure tracing, zero device
    work — flax's eager ``init`` costs minutes of per-op dispatch through a
    tunneled TPU); values are materialized host-side with numpy, seeded
    per-parameter-path so the result is deterministic across processes and
    backends: conv/dense kernels get fan-in-scaled normals, biases/BN means
    zeros, BN scales/vars ones.
    """
    import zlib

    import jax
    import numpy as np

    config = config or EfficientNetConfig()
    model = EfficientNetBackbone(config=config)
    dummy = jax.ShapeDtypeStruct(
        (1, config.patch_size, config.patch_size, 3), jnp.float32
    )
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), dummy)

    if hasattr(rng_key_or_seed, "dtype") and not isinstance(rng_key_or_seed, int):
        seed = int(np.asarray(jax.random.key_data(rng_key_or_seed)).ravel()[-1])
    else:
        seed = int(rng_key_or_seed)

    def materialize(path, leaf):
        name = jax.tree_util.keystr(path)
        terminal = name.rsplit("'", 2)[-2] if "'" in name else name
        if terminal in ("bias", "mean"):
            return np.zeros(leaf.shape, leaf.dtype)
        if terminal in ("scale", "var"):
            return np.ones(leaf.shape, leaf.dtype)
        # kernels: fan-in-scaled normal (path-seeded, process-independent).
        rng = np.random.default_rng(
            (zlib.crc32(name.encode()) ^ (seed & 0xFFFFFFFF)) & 0xFFFFFFFF
        )
        fan_in = int(np.prod(leaf.shape[:-1])) if len(leaf.shape) > 1 else 1
        std = float(np.sqrt(1.0 / max(fan_in, 1)))
        return (rng.standard_normal(leaf.shape) * std).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(materialize, shapes)
