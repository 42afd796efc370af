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

Two implementations with identical numerics:

- ``extract_patches_xla``: vmapped ``lax.dynamic_slice`` + fused affine —
  XLA fuses the normalize into the gather; robust baseline on any backend.
- ``extract_patches_pallas``: a Pallas TPU kernel that scalar-prefetches the
  point offsets and DMAs each crop HBM->VMEM directly, fusing the affine on
  the VPU. The image is viewed as (H, W*3) so the innermost (lane) dimension
  is patch_size*3 contiguous bytes per row rather than 3 — the layout that
  keeps DMA and VPU lanes utilized.

  STATUS (measured on v5e through the axon stack, 2026-08): Mosaic requires
  DMA slice offsets to be provably tile-aligned (8 sublanes / 128 lanes) and
  currently cannot lower any dynamic sub-tile shift — arbitrary-offset DMA
  fails ("tile index ... divisible by the tiling"), ``lax.dynamic_slice`` on
  values is an unimplemented primitive, and dynamic ``pltpu.roll`` trips an
  accelerator-type probe. The kernel therefore runs compiled only when point
  offsets happen to be tile-aligned; the production default is the XLA path,
  which XLA fuses end-to-end and which is a negligible fraction of the
  extraction cost next to the conv backbone. Interpret-mode tests pin the
  kernel's numerics against the XLA path so it is ready to promote when
  Mosaic grows dynamic-shift support.

Crop contract (both paths): patch[i, j] = image[r - ps//2 + i, c - ps//2 + j],
zeros outside the image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


# --------------------------------------------------------------------------
# XLA path
# --------------------------------------------------------------------------


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


# --------------------------------------------------------------------------
# Pallas path
# --------------------------------------------------------------------------


def _crop_kernel(patch_size: int):
    def kernel(starts_ref, image_ref, scale_ref, bias_ref, out_ref):
        p = pl.program_id(0)
        r = starts_ref[p, 0]
        c3 = starts_ref[p, 1] * 3

        def body(scratch, sem):
            dma = pltpu.make_async_copy(
                image_ref.at[pl.ds(r, patch_size), pl.ds(c3, patch_size * 3)],
                scratch,
                sem,
            )
            dma.start()
            dma.wait()
            # scale/bias rows (1, ps*3) broadcast across the patch's rows.
            out_ref[0] = scratch[:] * scale_ref[:] + bias_ref[:]

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((patch_size, patch_size * 3), jnp.float32),
            sem=pltpu.SemaphoreType.DMA,
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("patch_size", "interpret"))
def extract_patches_pallas(
    padded_image: jnp.ndarray,
    starts: jnp.ndarray,
    patch_size: int,
    scale_row: jnp.ndarray,
    bias_row: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas crop+normalize: (Hp, Wp, 3) -> (P, ps, ps, 3) float32.

    scale_row/bias_row are the per-channel affine tiled across one patch row:
    shape (1, ps*3), pattern [s0, s1, s2, s0, ...] — the channel phase is
    stable because column offsets are multiplied by 3 inside the kernel.
    """
    n_points = starts.shape[0]
    hp, wp, _ = padded_image.shape
    image2d = padded_image.reshape(hp, wp * 3)
    # float32 in VMEM: the DMA source dtype must match the scratch dtype, so
    # convert up front (uint8 HBM->VMEM DMA with widening is not a DMA op).
    image2d = image2d.astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_points,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # image stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale row
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias row
        ],
        out_specs=pl.BlockSpec(
            (1, patch_size, patch_size * 3),
            lambda p, *_: (p, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    out = pl.pallas_call(
        _crop_kernel(patch_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_points, patch_size, patch_size * 3), jnp.float32
        ),
        interpret=interpret,
    )(starts.astype(jnp.int32), image2d, scale_row, bias_row)
    return out.reshape(n_points, patch_size, patch_size, 3)


def make_affine_rows(
    scale: np.ndarray, bias: np.ndarray, patch_size: int
) -> tuple[np.ndarray, np.ndarray]:
    """Tile per-channel (3,) affine vectors across a (1, ps*3) patch row for
    the Pallas kernel's lane layout."""
    scale_row = np.tile(np.asarray(scale, np.float32), patch_size)[None, :]
    bias_row = np.tile(np.asarray(bias, np.float32), patch_size)[None, :]
    return scale_row, bias_row


def default_pallas_interpret() -> bool:
    """Pallas TPU kernels run compiled on TPU, interpreted elsewhere (tests
    on the CPU mesh exercise identical kernel logic via the interpreter)."""
    return jax.default_backend() != "tpu"
