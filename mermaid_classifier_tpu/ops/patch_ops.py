"""Point-patch extraction: fused crop + normalize feeding the backbone.

The reference crops a patch_size x patch_size window centered on each
annotated (row, col) point and runs torchvision normalization before the
backbone forward (reference: scripts/build_feature_bucket.py:415-446,
SURVEY.md §2.3). Here that becomes a fixed-shape device computation:

  1. The decoded image is zero-padded by patch_size//2 on every side once,
     so every crop is in-bounds (out-of-image pixels are zeros) and all
     slices are the same static shape — no dynamic shapes under jit.
  2. Patches are gathered at dynamic offsets and normalized in one fused
     step: ``out = x * scale + bias`` with per-channel
     scale = 1/(255*std), bias = -mean/std (uint8 in, float32 out).

Production path: ``extract_patches_xla`` — vmapped ``lax.dynamic_slice``
with the affine fused by XLA, compiled INSIDE the extractor's chunk-scanned
program so the patch tensor never crosses a program boundary. Measured at
~1.3 µs/patch, ~3% of the extraction step (docs/perf_roofline.md). A Pallas
crop kernel lives in ``experiments/pallas_crop.py`` with the full table of
Mosaic lowering attempts and the promotion criteria; on the current
toolchain no dynamic sub-tile shift lowers, and even a free kernel would
save ≤3%.

Crop contract: patch[i, j] = image[r - ps//2 + i, c - ps//2 + j],
zeros outside the image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def channel_scale_bias(
    mean_rgb: tuple[float, float, float],
    std_rgb: tuple[float, float, float],
) -> tuple[np.ndarray, np.ndarray]:
    """Per-channel affine folding /255 and (x-mean)/std into x*scale+bias."""
    mean = np.asarray(mean_rgb, dtype=np.float32)
    std = np.asarray(std_rgb, dtype=np.float32)
    scale = (1.0 / (255.0 * std)).astype(np.float32)
    bias = (-mean / std).astype(np.float32)
    return scale, bias


def pad_image(image: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Zero-pad (H, W, 3) by patch_size//2 on each spatial side."""
    half = patch_size // 2
    return jnp.pad(image, ((half, half), (half, half), (0, 0)))


def rowcols_to_starts(rowcols: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Map original-image (row, col) point centers to top-left offsets in the
    padded image. With pad = ps//2, the centered crop starting at
    r - ps//2 in the original lands exactly at r in the padded image."""
    del patch_size  # the identity holds for any ps given pad = ps//2
    return jnp.asarray(rowcols, dtype=jnp.int32)


def extract_patches_xla(
    padded_image: jnp.ndarray,
    starts: jnp.ndarray,
    patch_size: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    out_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Gather + normalize via vmapped dynamic_slice.

    padded_image: (Hp, Wp, 3) uint8 (or float32); starts: (P, 2) int32;
    returns (P, ps, ps, 3) in ``out_dtype``. The affine always computes in
    float32; ``out_dtype=bfloat16`` halves the materialized patch tensor's
    HBM traffic when feeding a bfloat16 trunk (the gather output is the
    single largest intermediate in the extraction pipeline: P*ps*ps*3
    floats).
    """

    def one(start):
        patch = jax.lax.dynamic_slice(
            padded_image,
            (start[0], start[1], 0),
            (patch_size, patch_size, 3),
        )
        return (patch.astype(jnp.float32) * scale + bias).astype(out_dtype)

    return jax.vmap(one)(starts)
