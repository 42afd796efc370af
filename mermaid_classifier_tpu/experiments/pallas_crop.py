"""EXPERIMENT: Pallas patch-crop kernel. Demoted from the production path.

## Verdict (measured, v5e via the axon Mosaic stack, 2026-08)

The production gather is ``ops.patch_ops.extract_patches_xla`` fused into
the chunk-scanned extraction program. This kernel stays as an experiment
because, on current Mosaic, an arbitrary-offset crop cannot beat it:

| approach | status | measurement / blocker |
|---|---|---|
| XLA vmapped dynamic_slice + affine (production) | works | ~1.3 µs/patch inside the fused program — ~3% of the 42.5 µs/patch extraction step |
| Pallas direct DMA at arbitrary offsets | will not lower | Mosaic requires DMA offsets provably tile-aligned ("tile index ... divisible by the tiling") |
| Pallas aligned-window DMA + dynamic VMEM read `ref[pl.ds(dr, ps), ...]` | will not lower | row (sublane) shift, col (lane) shift, and both: compile-helper rejects each (probed separately) |
| `lax.dynamic_slice` on values inside the kernel | will not lower | unimplemented primitive |
| dynamic `pltpu.roll` | will not lower | accelerator-type probe failure |
| in-VMEM shift via one-hot matmuls (iota/select + MXU) | lowerable but pointless | shift matrices cost ~0.36 GFLOP/patch ≈ half a backbone forward, versus the ~3% the gather costs today |

Even a zero-cost crop kernel would save at most ~3% of the extraction
step, so no further engineering is justified until Mosaic can lower a
dynamic sub-tile shift. Promotion criteria: (a) Mosaic accepts a dynamic
VMEM read or sub-tile DMA, and (b) the kernel beats the XLA gather inside
the fused chunk-scan program on-chip.

## What works today

The kernel below compiles and runs on TPU when every point offset is
tile-aligned (row % 8 == 0 and 3*col % 128 == 0), and runs everywhere in
interpret mode; tests pin its numerics against the XLA path either way.

Crop contract (same as production): patch[i, j] = image[r - ps//2 + i,
c - ps//2 + j], zeros outside the image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    Compiled mode requires tile-aligned offsets (see module docstring).
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
