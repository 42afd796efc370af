"""Pallas k5 depthwise conv — the register-tiled attack on XLA's k5
depthwise emitter.

Motivation (docs/perf_roofline.md §3.1): the trunk's k=5 depthwise stages
cost far beyond their tensors — the 672-channel 14² block measures
8.3 µs/patch isolated against 0.22 µs for its k3 neighbor in the same
harness; XLA's k5 depthwise emitter, not HBM, is the binding constraint
for stages 2/4/5 (~22 µs of the 39.1 µs folded trunk). The round-2 fused
block kernel lost partly because its depthwise tap loop sliced the padded
buffer REF per tap (a VMEM access each); this kernel is built around taps
as STATIC slices of a 4-D block whose last two dims are (W+2p, Cpad):

- channels pad host-side to a lane-tile multiple (128), so every tap
  slice is lane-aligned and the per-channel tap weight is a natural lane
  broadcast;
- tap (dy, dx) is the static element-offset slice [dy:dy+H, dx:dx+W] —
  static offsets are the one shift Mosaic reliably lowers on this stack
  (dynamic sub-tile shifts reject: experiments/pallas_crop.py);
- the accumulator stays f32 in vregs across all 25 taps, one write out.

Stride-1 blocks only (the s2 k5 convs stay on the native emitter: strided
value slices are not reliably lowerable). Numerics: bf16 inputs, f32
accumulation — identical contract to the XLA tap-sum (`_dw_taps`), pinned
by tests/ops/test_depthwise.py in interpret mode and gated on TPU by the
device-numerics cosine gate like every reduced-precision path.

Reference behavior reproduced: the depthwise stage of torch MBConv blocks
inside the extractor (reference: scripts/build_feature_bucket.py:415-446).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _lane_pad(c: int) -> int:
    return -(-c // 128) * 128


def _dw_kernel(x_ref, w_ref, b_ref, out_ref, *, h: int, w: int, k: int,
               acc_dtype, out_dtype):
    """One grid step: ``block_b`` maps through the k×k depthwise.

    x_ref:  (B, H+2p, W+2p, CP) — spatial+channel padded input
    w_ref:  (k*k, CP) f32 tap weights
    b_ref:  (CP,) f32 bias
    out_ref:(B, H, W, CP)
    """
    x = x_ref[...]
    acc = jnp.zeros(out_ref.shape, acc_dtype) + b_ref[...][
        None, None, None, :
    ].astype(acc_dtype)
    for dy in range(k):
        for dx in range(k):
            tap = x[:, dy:dy + h, dx:dx + w, :].astype(acc_dtype)
            acc = acc + tap * w_ref[dy * k + dx, :][
                None, None, None, :
            ].astype(acc_dtype)
    out_ref[...] = acc.astype(out_dtype)


def depthwise_conv_pallas(
    x: jnp.ndarray,
    w_dw: jnp.ndarray,
    b_dw: jnp.ndarray,
    *,
    kernel: int = 5,
    block_b: int | None = None,
    acc_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-1 SAME depthwise conv + bias as one Pallas kernel.

    x: (N, H, W, C); w_dw: (k, k, C) per-channel taps; b_dw: (C,).
    Returns (N, H, W, C) in x.dtype (accumulated in ``acc_dtype``).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    k = kernel
    if w_dw.shape != (k, k, c):
        raise ValueError(f"w_dw {w_dw.shape} != {(k, k, c)}")
    p = (k - 1) // 2
    cp = _lane_pad(c)
    out_dtype = x.dtype

    # Host/XLA-side prep: symmetric spatial zero pad + channel pad to the
    # lane tile. XLA fuses this into the producer; the kernel sees aligned
    # static geometry only.
    # All prep is jnp (trace-safe: weights arrive as jit arguments in the
    # folded-schedule forward) and fuses into the producers.
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, cp - c)))
    wk = jnp.pad(
        jnp.asarray(w_dw, jnp.float32).reshape(k * k, c),
        ((0, 0), (0, cp - c)),
    )
    bk = jnp.pad(jnp.asarray(b_dw, jnp.float32), (0, cp - c))

    if block_b is None:
        # VMEM budget: padded bf16 input block + f32 accumulator + output,
        # with sublane-tile padding on the W dims folded in.
        itemsize = jnp.dtype(out_dtype).itemsize
        sub = 32 // max(itemsize, 1)  # sublane tile rows for this dtype
        wp_t = -(-(w + 2 * p) // sub) * sub
        w_t = -(-w // 8) * 8
        per_patch = (
            3 * (h + 2 * p) * wp_t * cp * itemsize  # in block (dbl-buffered)
            + 2 * h * w_t * cp * 4 * 2              # f32 acc + tap staging
            + 2 * h * w_t * cp * itemsize           # out block (dbl-buffered)
        )
        # Measured on v5e: Mosaic's scoped stack for the 25-tap chain runs
        # ~2x a naive in+acc+out estimate (the x value and slice temps stay
        # live); 6 MB of estimated per-patch budget keeps the real scoped
        # allocation under the 16 MB limit on every trunk geometry.
        block_b = max(1, min(n, (6 * 1024 * 1024) // per_patch))
    while n % block_b:
        block_b -= 1

    kern = functools.partial(
        _dw_kernel, h=h, w=w, k=k,
        acc_dtype=jnp.dtype(acc_dtype), out_dtype=out_dtype,
    )
    out = pl.pallas_call(
        kern,
        grid=(n // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, h + 2 * p, w + 2 * p, cp),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, h, w, cp),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cp), out_dtype),
        interpret=interpret,
    )(xp, wk, bk)
    return out[..., :c]
