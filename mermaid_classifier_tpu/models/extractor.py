"""FeatureExtractor: decoded image + annotated points -> feature vectors.

TPU-native replacement for the reference's ``_DeviceCachingExtractor`` torch
path (reference: scripts/build_feature_bucket.py:375-448): the network is
built once and cached, patches are gathered and normalized on device (Pallas
kernel on TPU, identical-math XLA path elsewhere), and the backbone runs in
fixed-size batches so XLA compiles a handful of programs total instead of one
per image.

Static-shape discipline (SURVEY.md §7 "fixed shapes vs ragged data"):

- images are bucketed: spatial dims padded up to multiples of
  ``image_bucket`` (bottom/right, zeros) after the centered patch pad, so
  the gather compiles once per size bucket, not per image;
- point counts are padded up to multiples of ``point_bucket`` (duplicating
  point 0) and trimmed after the forward;
- the backbone always sees (backbone_batch, ps, ps, 3).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mermaid_classifier_tpu.models.efficientnet import (
    EfficientNetBackbone,
    EfficientNetConfig,
    init_backbone_params,
)
from mermaid_classifier_tpu.ops.patch_ops import (
    channel_scale_bias,
    extract_patches_xla,
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class DeviceNumericsError(RuntimeError):
    """Raised when the device backbone diverges from the host-CPU backbone
    beyond the cosine-similarity gate (reference analog:
    scripts/build_feature_bucket.py:451-502, min cosine >= 0.999)."""


class FeatureExtractor:
    """Cached-backbone batched point-feature extractor."""

    def __init__(
        self,
        variables: Any,
        config: EfficientNetConfig | None = None,
        *,
        backbone_batch: int = 128,
        point_bucket: int = 32,
        image_bucket: int = 256,
        use_pallas: bool | None = None,
        backbone_impl: str | None = None,
        mesh: Any = None,
    ) -> None:
        self.config = config or EfficientNetConfig()
        self.variables = variables
        self.backbone_batch = int(backbone_batch)
        self.point_bucket = int(point_bucket)
        self.image_bucket = int(image_bucket)
        # The gather is the XLA path, fused into the chunk-scanned program
        # (measured ~3% of the step; docs/perf_roofline.md). use_pallas=True
        # swaps in the EXPERIMENTAL Pallas crop kernel
        # (experiments/pallas_crop.py) — compiled mode needs tile-aligned
        # offsets on the current Mosaic stack; see that module's table.
        self.use_pallas = bool(use_pallas) if use_pallas is not None else False
        self._model = EfficientNetBackbone(config=self.config)
        # Backbone implementation (default everywhere: "folded"):
        #   "folded" — BatchNorm folded into the convs, plain XLA ops: the
        #              measured v5e fast path (+10% over flax,
        #              docs/perf_roofline.md §3.2); answers to the same
        #              device-numerics gate as every optimized path. Under
        #              a mesh the folded forward is what gets sharded.
        #   "flax"   — the nn.Module forward (parity reference).
        #   "fused"  — folded weights + VMEM-fused Pallas MBConv blocks
        #              for the eligible stride-1 blocks (ops/fused_mbconv
        #              .py; kept for measurement — XLA wins in-context);
        #              single-device only.
        if backbone_impl is None:
            backbone_impl = "folded"
        self.backbone_impl = str(backbone_impl)
        if self.backbone_impl not in ("flax", "folded", "fused"):
            raise ValueError(
                f"backbone_impl must be flax|folded|fused,"
                f" got {self.backbone_impl!r}"
            )
        # self._forward(weights, patches) is the configured forward and
        # self._weights is the EXACT pytree it consumes, pinned on device
        # ONCE for the single-device path: production bundles arrive as
        # host numpy, and passing those to a jitted call re-uploads the
        # full parameter set every dispatch (hundreds of ms through a
        # tunneled backend; docs/perf_roofline.md). Folding happens on the
        # HOST bundle first so the flax variables are never shipped to the
        # device just to be ignored.
        folded_host = None
        if self.backbone_impl != "flax":
            if mesh is not None and self.backbone_impl == "fused":
                raise ValueError(
                    "fused backbone_impl is single-device; the mesh path"
                    " shards the folded or flax forward."
                )
            from mermaid_classifier_tpu.ops.fused_mbconv import (
                apply_folded,
                default_interpret,
                fold_backbone,
            )

            folded_host = fold_backbone(variables, self.config)
            run_fused = self.backbone_impl == "fused"
            cfg = self.config

            def _forward(weights, patches):
                # default_interpret() is read at trace time (first call),
                # not construction time: an extractor built before backend
                # selection must not bake in a stale interpret decision.
                return apply_folded(
                    weights, cfg, patches,
                    fused=run_fused, interpret=default_interpret(),
                )

            self._forward = _forward
            self._weights = (
                jax.device_put(jax.tree.map(jnp.asarray, folded_host))
                if mesh is None
                else folded_host  # the sharded fn pins its own replicas
            )
        else:
            self._forward = self._model.apply
            self._weights = (
                jax.device_put(variables) if mesh is None else variables
            )
        scale, bias = channel_scale_bias(self.config.mean_rgb, self.config.std_rgb)
        self._scale = jnp.asarray(scale)
        self._bias = jnp.asarray(bias)
        if self.use_pallas:
            from mermaid_classifier_tpu.experiments.pallas_crop import (
                make_affine_rows,
            )

            scale_row, bias_row = make_affine_rows(
                scale, bias, self.config.patch_size
            )
            self._scale_row = jnp.asarray(scale_row)
            self._bias_row = jnp.asarray(bias_row)

        # Multi-chip: when a Mesh is given, the backbone forward shards its
        # batch over every device (params replicated, XLA splits the batch —
        # parallel/sharded_extract). backbone_batch must then divide evenly.
        self.mesh = mesh
        if mesh is not None:
            from mermaid_classifier_tpu.parallel.sharded_extract import (
                make_sharded_feature_fn,
            )

            n_devices = mesh.devices.size
            if self.backbone_batch % n_devices != 0:
                raise ValueError(
                    f"backbone_batch={self.backbone_batch} must be divisible"
                    f" by the {n_devices}-device mesh."
                )
            sharded = make_sharded_feature_fn(
                mesh, variables, self.config,
                backbone_impl=self.backbone_impl,
                prefolded=folded_host,
            )
            self._apply = lambda _vars, patches: sharded(patches)
        else:
            self._apply = jax.jit(self._forward)
        # Gather emits the trunk's compute dtype so the materialized patch
        # tensor (the pipeline's largest intermediate) is half-size under a
        # bfloat16 trunk.
        self._gather_xla = jax.jit(
            functools.partial(
                extract_patches_xla,
                patch_size=self.config.patch_size,
                out_dtype=jnp.dtype(self.config.compute_dtype),
            ),
            static_argnames=(),
        )

        # Single-device fast path: ONE program scanning backbone_batch-sized
        # chunks, gather fused into each scan step. Measured on v5e: the
        # whole-batch program degrades past ~1k patches (the multi-MB patch
        # tensor defeats XLA's scheduling), while chunked lax.scan at 128
        # holds ~42.5 us/patch vs ~52 flat — +23% throughput — and one
        # dispatch per image amortizes the tunnel/dispatch latency
        # (docs/perf_roofline.md). Numerics identical: chunks are
        # independent rows.
        if mesh is None:
            ps = self.config.patch_size
            feature_dim = self.config.feature_dim
            out_dtype = jnp.dtype(self.config.compute_dtype)

            def _fused_scan(variables, padded, starts3):
                def body(carry, starts):
                    patches = extract_patches_xla(
                        padded, starts, ps, self._scale, self._bias,
                        out_dtype=out_dtype,
                    )
                    return carry, self._forward(variables, patches)

                _, feats = jax.lax.scan(body, None, starts3)
                return feats.reshape(-1, feature_dim)

            def _backbone_scan(variables, patches3):
                def body(carry, patches):
                    return carry, self._forward(variables, patches)

                _, feats = jax.lax.scan(body, None, patches3)
                return feats.reshape(-1, feature_dim)

            half = self.config.patch_size // 2

            def _pad_on_device(raw, hp, wp):
                out = jnp.zeros((hp, wp, raw.shape[2]), raw.dtype)
                return jax.lax.dynamic_update_slice(out, raw, (half, half, 0))

            self._fused_scan = jax.jit(_fused_scan)
            self._backbone_scan = jax.jit(_backbone_scan)
            # Pad on device from the RAW upload: the centered+bucket padding
            # is zeros, and shipping those zeros through a slow host link is
            # pure waste (~26% of the image bytes at 1536^2).
            self._pad_on_device = jax.jit(
                _pad_on_device, static_argnames=("hp", "wp")
            )
        else:
            self._fused_scan = None
            self._backbone_scan = None
            self._pad_on_device = None

    @property
    def feature_dim(self) -> int:
        return self.config.feature_dim

    # -- patch gathering ----------------------------------------------------

    def _prepare_image(self, image: np.ndarray) -> np.ndarray:
        """Centered zero pad (ps//2 each side) + bottom/right pad to the
        size bucket. Host-side numpy: cheap, and keeps the device transfer
        a single contiguous buffer per bucket shape."""
        if image.ndim != 3 or image.shape[2] != 3:
            raise ValueError(f"image must be (H, W, 3), got {image.shape}")
        ps = self.config.patch_size
        half = ps // 2
        h, w, _ = image.shape
        hp = _round_up(h + 2 * half, self.image_bucket)
        wp = _round_up(w + 2 * half, self.image_bucket)
        out = np.zeros((hp, wp, 3), dtype=image.dtype)
        out[half : half + h, half : half + w] = image
        return out

    def _gather(self, padded: np.ndarray, starts: np.ndarray) -> jnp.ndarray:
        if self.use_pallas:
            from mermaid_classifier_tpu.experiments.pallas_crop import (
                default_pallas_interpret,
                extract_patches_pallas,
            )

            return extract_patches_pallas(
                jnp.asarray(padded),
                jnp.asarray(starts, jnp.int32),
                self.config.patch_size,
                self._scale_row,
                self._bias_row,
                interpret=default_pallas_interpret(),
            )
        return self._gather_xla(
            jnp.asarray(padded),
            jnp.asarray(starts, jnp.int32),
            scale=self._scale,
            bias=self._bias,
        )

    def _validate_rowcols(
        self, image: np.ndarray, rowcols: np.ndarray
    ) -> np.ndarray:
        rowcols = np.asarray(rowcols, dtype=np.int32)
        if rowcols.ndim != 2 or rowcols.shape[1] != 2:
            raise ValueError(f"rowcols must be (P, 2), got {rowcols.shape}")
        if rowcols.shape[0]:
            h, w, _ = image.shape
            if (rowcols < 0).any() or (rowcols[:, 0] >= h).any() or (
                rowcols[:, 1] >= w
            ).any():
                raise ValueError(
                    "rowcols contains points outside the image"
                    f" (image is {h}x{w})."
                )
        return rowcols

    @staticmethod
    def _pad_starts(rowcols: np.ndarray, multiple: int) -> np.ndarray:
        """Pad the point list up to ``multiple`` by duplicating point 0.
        With centered pad ps//2, the crop starting at r - ps//2 in the
        original image begins exactly at row r of the padded image."""
        n = rowcols.shape[0]
        n_pad = _round_up(n, multiple)
        starts = np.zeros((n_pad, 2), dtype=np.int32)
        starts[:n] = rowcols
        starts[n:] = rowcols[0]
        return starts

    def extract_patches(
        self, image: np.ndarray, rowcols: np.ndarray
    ) -> jnp.ndarray:
        """(H, W, 3) uint8 + (P, 2) points -> (P, ps, ps, 3) float32
        normalized patches (padding points trimmed)."""
        rowcols = self._validate_rowcols(image, rowcols)
        n = rowcols.shape[0]
        if n == 0:
            ps = self.config.patch_size
            return jnp.zeros((0, ps, ps, 3), jnp.float32)
        padded = self._prepare_image(image)
        starts = self._pad_starts(rowcols, self.point_bucket)
        patches = self._gather(padded, starts)
        return patches[:n]

    # -- backbone -----------------------------------------------------------

    def features_for_patches_device(self, patches: jnp.ndarray) -> jnp.ndarray:
        """(P, ps, ps, 3) -> (P, D) as a DEVICE array; dispatch only, no
        host sync — callers can pipeline host work against the compute."""
        n = patches.shape[0]
        if n == 0:
            return jnp.zeros((0, self.feature_dim), jnp.float32)
        bb = self.backbone_batch
        n_pad = _round_up(n, bb)
        if n_pad != n:
            patches = jnp.concatenate(
                [patches, jnp.zeros((n_pad - n, *patches.shape[1:]), patches.dtype)]
            )
        n_chunks = n_pad // bb
        if self._backbone_scan is not None and n_chunks > 1:
            # One program scanning fixed chunks (see __init__ note).
            feats = self._backbone_scan(
                self._weights, patches.reshape(n_chunks, bb, *patches.shape[1:])
            )
            return feats[:n]
        outs = []
        for i in range(0, n_pad, bb):
            outs.append(self._apply(self._weights, patches[i : i + bb]))
        return jnp.concatenate(outs)[:n] if len(outs) > 1 else outs[0][:n]

    def features_for_patches(self, patches: jnp.ndarray) -> np.ndarray:
        """(P, ps, ps, 3) float32 -> (P, D) float32 on host, batching the
        backbone at the fixed backbone_batch shape."""
        return np.asarray(self.features_for_patches_device(patches))

    def extract_features_device(
        self, image: np.ndarray, rowcols: np.ndarray
    ) -> jnp.ndarray:
        """Per-image dispatch WITHOUT the host readback: returns the (P, D)
        device array so a caller can overlap the next image's decode/
        transfer with this one's compute (the feature-bucket builder's
        depth-1 pipeline).

        Single-device path: gather + backbone fused into one chunk-scanned
        program — the patch tensor never round-trips HBM between two
        programs and the whole image costs one dispatch."""
        if self._fused_scan is not None and not self.use_pallas:
            rowcols = self._validate_rowcols(image, rowcols)
            n = rowcols.shape[0]
            if n == 0:
                return jnp.zeros((0, self.feature_dim), jnp.float32)
            if image.ndim != 3 or image.shape[2] != 3:
                raise ValueError(f"image must be (H, W, 3), got {image.shape}")
            ps = self.config.patch_size
            half = ps // 2
            h, w, _ = image.shape
            # Host-side: snap the raw image to a coarse 64-px shape bucket
            # (cheap zeros) so the device pad program compiles once per
            # bucket, not per camera resolution — the fixed-shapes-under-jit
            # discipline — while the big centered padding still happens on
            # device and never crosses the host link.
            raw_bucket = 64
            hr = _round_up(h, raw_bucket)
            wr = _round_up(w, raw_bucket)
            if (hr, wr) != (h, w):
                raw = np.zeros((hr, wr, 3), dtype=image.dtype)
                raw[:h, :w] = image
            else:
                raw = image
            hp = _round_up(max(h + 2 * half, hr + half), self.image_bucket)
            wp = _round_up(max(w + 2 * half, wr + half), self.image_bucket)
            padded = self._pad_on_device(jnp.asarray(raw), hp=hp, wp=wp)
            starts = self._pad_starts(rowcols, self.backbone_batch)
            starts3 = starts.reshape(-1, self.backbone_batch, 2)
            feats = self._fused_scan(self._weights, padded, jnp.asarray(starts3))
            return feats[:n]
        patches = self.extract_patches(image, rowcols)
        return self.features_for_patches_device(patches)

    def extract_features(
        self, image: np.ndarray, rowcols: np.ndarray
    ) -> np.ndarray:
        """The per-image entry point: decoded image + points -> (P, D)
        float32 feature vectors (reference contract:
        build_feature_bucket.py:415-446)."""
        return np.asarray(self.extract_features_device(image, rowcols))

    def extract_features_many(
        self, items: list[tuple[np.ndarray, np.ndarray]]
    ) -> list[np.ndarray]:
        """Cross-image patch packing: gather every image's patches, run ONE
        packed backbone pass over all of them, split per image.

        The production serve shape is ~25 points per image
        (reference: annotation.py:249-261); per-image forwards would pad 25
        up to backbone_batch and waste >80% of each launch. Packing patches
        across images fills the fixed batch before paying for a forward —
        identical numerics to per-image extraction (the backbone has no
        cross-patch coupling; differential-tested)."""
        patch_batches = []
        counts = []
        for image, rowcols in items:
            patches = self.extract_patches(image, rowcols)
            counts.append(patches.shape[0])
            if patches.shape[0]:
                patch_batches.append(patches)
        if not patch_batches:
            return [
                np.zeros((0, self.feature_dim), np.float32) for _ in items
            ]
        packed = (
            jnp.concatenate(patch_batches)
            if len(patch_batches) > 1
            else patch_batches[0]
        )
        features = np.asarray(self.features_for_patches_device(packed))
        out: list[np.ndarray] = []
        offset = 0
        for count in counts:
            out.append(features[offset : offset + count])
            offset += count
        return out

    # -- numerics self-check --------------------------------------------------

    def verify_device_numerics(
        self, n_patches: int = 8, min_cosine: float = 0.999, seed: int = 0
    ) -> float:
        """Run random patches through the backbone AS CONFIGURED (device,
        compute dtype) and through a float32 reference graph on the host
        CPU; gate on min cosine similarity. This is what makes the gate
        meaningful for reduced-precision trunks — the reference side is
        always float32 (reference: scripts/build_feature_bucket.py:451-502)."""
        ps = self.config.patch_size
        rng = np.random.default_rng(seed)
        patches = rng.random((n_patches, ps, ps, 3)).astype(np.float32)

        # Probe through a direct jit of the configured forward — including
        # the folded/fused backbone_impl when selected, so the gate covers
        # exactly what production will run (NOT the mesh-sharded runner,
        # whose divisibility contract is about batch layout, not numerics
        # — the per-example math is identical).
        device_out = np.asarray(
            jax.jit(self._forward)(self._weights, jnp.asarray(patches))
        )

        from dataclasses import replace

        f32_model = EfficientNetBackbone(
            config=replace(self.config, compute_dtype="float32")
        )
        try:
            reference_device = jax.devices("cpu")[0]
        except RuntimeError:
            # Some TPU plugins (axon) register ONLY their own backend, so
            # no host-CPU device exists in-process. The gate still holds:
            # the reference side stays a float32 graph — on the same
            # device — which is exactly how the bench gates its folded/
            # bf16 schedules. What the gate then can't see is a
            # device-wide f32 defect that the f32 reference shares; the
            # CPU cross-check for that runs in CI (tests exercise this
            # method on the CPU backend).
            reference_device = jax.devices()[0]
        with jax.default_device(reference_device):
            ref_vars = jax.device_put(
                jax.tree.map(np.asarray, self.variables), reference_device
            )
            cpu_out = np.asarray(
                jax.jit(f32_model.apply)(ref_vars, jnp.asarray(patches))
            )

        num = np.sum(device_out * cpu_out, axis=1)
        denom = np.linalg.norm(device_out, axis=1) * np.linalg.norm(cpu_out, axis=1)
        cosines = num / np.maximum(denom, 1e-12)
        worst = float(np.min(cosines))
        if worst < min_cosine:
            raise DeviceNumericsError(
                f"device backbone features diverge from CPU: min cosine"
                f" {worst:.6f} < {min_cosine}. Refusing to extract."
            )
        return worst


def build_extractor(
    weights: Any | None = None,
    config: EfficientNetConfig | None = None,
    seed: int = 0,
    **kwargs: Any,
) -> FeatureExtractor:
    """Construct an extractor from a weights bundle (variables pytree) or,
    when None, deterministic seeded-random weights (tests/bench)."""
    config = config or EfficientNetConfig()
    if weights is None:
        weights = init_backbone_params(jax.random.PRNGKey(seed), config)
    return FeatureExtractor(weights, config, **kwargs)
