"""VMEM-fused MBConv blocks: the extraction trunk's HBM-traffic killer.

The chunk-scanned XLA extraction program is HBM-bandwidth-bound
(docs/perf_roofline.md §3): every MBConv block round-trips its 6x-expanded
activation tensor through HBM several times (expand write, depthwise
read/write, SE read + scale write, project read). This module removes those
round trips for the stride-1 blocks by running an entire block —
expand 1x1 -> depthwise k x k -> squeeze-excite -> project 1x1 -> residual —
as ONE Pallas kernel whose intermediates never leave VMEM. Per fused block,
HBM traffic drops from ~4 passes over the expanded tensor to exactly one
read of the block input and one write of the block output.

Design notes (TPU/Mosaic constraints shape everything here):

- **BatchNorm is folded into the convolutions host-side** (`fold_backbone`):
  inference-only backbone, running stats — w' = w * gamma/sqrt(var+eps),
  b' = beta - mean * gamma/sqrt(var+eps). The kernel sees plain
  conv+bias and the XLA fallback path uses the same folded weights, so
  fused and unfused blocks agree to float-rounding.
- **Flattened spatial layout**: activations travel as (B, H*W, C) — C on
  the 128-wide lanes, H*W on sublanes. The depthwise conv never reshapes
  to (H, W): each tap (dy, dx) is a STATIC slice of a zero-padded flat
  buffer at offset dy*W + dx (legal in Mosaic, unlike the dynamic
  sub-tile offsets that killed the crop kernel — experiments/pallas_crop).
  Columns that would wrap across row boundaries are masked with a
  precomputed col-index mask, which is exactly the horizontal zero pad.
- **Static everything**: per-block Python constants (H, W, k, channel
  sizes) specialize the kernel at trace time; the grid walks patches.
- **Mixed precision**: activations are stored bf16 (or the configured
  dtype), matmuls accumulate float32 on the MXU
  (preferred_element_type), the depthwise accumulator and the SE
  global mean run in float32, biases/weights stay float32. The fused
  path must pass the device-numerics cosine gate like every
  reduced-precision path (CLAUDE.md).

Reference behavior being reproduced: the torch EfficientNet MBConv blocks
inside the feature extractor (reference: scripts/build_feature_bucket.py:
415-446 drives them; block semantics per torchvision EfficientNet-B0).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mermaid_classifier_tpu.models.efficientnet import EfficientNetConfig


# ---------------------------------------------------------------------------
# BN folding
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BlockMeta:
    """Static shape/topology facts for one MBConv block."""

    in_channels: int
    mid_channels: int
    out_channels: int
    kernel: int
    stride: int
    has_expand: bool
    residual: bool
    # Spatial extent of the block INPUT for a patch-sized image.
    h: int
    w: int


# Folded-weight pytrees carry BlockMeta next to arrays; registering it as
# static lets a folded bundle cross jit boundaries as an argument.
jax.tree_util.register_static(BlockMeta)


def default_interpret() -> bool:
    """Fused kernels run compiled on TPU, interpreted elsewhere (the CPU
    test mesh exercises identical kernel logic via the interpreter)."""
    return jax.default_backend() != "tpu"


def fusable(meta: "BlockMeta") -> bool:
    """Blocks the Pallas kernel takes: stride 1 (static-offset taps) with
    an expansion (the 6x tensors are where the HBM win is) and a spatial
    map small enough that the padded buffer + f32 accumulator fit VMEM
    (56^2 x 144 is the largest: ~8.5 MB with double-buffered I/O)."""
    return meta.stride == 1 and meta.has_expand and meta.h <= 56


def _fold(conv_kernel, bn_scale, bn_bias, bn_mean, bn_var, eps):
    """Fold BatchNorm(running stats) into the preceding conv's weights."""
    g = bn_scale / np.sqrt(bn_var + eps)
    w = np.asarray(conv_kernel) * g  # broadcast over trailing out-channel dim
    b = bn_bias - bn_mean * g
    return w.astype(np.float32), b.astype(np.float32)


def block_metas(config: EfficientNetConfig) -> list[BlockMeta]:
    """Per-block static metadata in execution order."""
    metas: list[BlockMeta] = []
    in_ch = config.stem_channels
    h = config.patch_size // 2  # after the stride-2 stem
    for expand, out_ch, repeats, stride, kernel in config.stages:
        for block_idx in range(repeats):
            s = stride if block_idx == 0 else 1
            mid = in_ch * expand
            metas.append(
                BlockMeta(
                    in_channels=in_ch,
                    mid_channels=mid,
                    out_channels=out_ch,
                    kernel=kernel,
                    stride=s,
                    has_expand=expand != 1,
                    residual=(s == 1 and in_ch == out_ch),
                    h=h,
                    w=h,
                )
            )
            if s == 2:
                # Symmetric-pad stride-2 convs emit ceil(h/2) (p=(k-1)//2:
                # out = floor((h-1)/2)+1) — floor would mis-size every
                # block after an odd-size transition (b1..b3 resolutions).
                h = -(-h // 2)
            in_ch = out_ch
    return metas


def fold_backbone(variables: Any, config: EfficientNetConfig) -> dict:
    """Fold every BatchNorm in the backbone into its conv; returns a plain
    dict of numpy float32 weights keyed the way ``apply_folded`` consumes
    them. Pure host-side preprocessing, done once per weight bundle."""
    BN_EPS = config.bn_eps

    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    def fold_cba(name):
        p, s = params[name], stats[name]
        return _fold(
            p["conv"]["kernel"], p["bn"]["scale"], p["bn"]["bias"],
            s["bn"]["mean"], s["bn"]["var"], BN_EPS,
        )

    folded: dict[str, Any] = {}
    folded["stem"] = fold_cba("stem")
    blocks = []
    for i, meta in enumerate(block_metas(config)):
        # Recover the flax module name for this block.
        name = _block_name(config, i)
        p, s = params[name], stats[name]
        blk: dict[str, Any] = {"meta": meta}
        if meta.has_expand:
            blk["expand"] = _fold(
                p["expand"]["conv"]["kernel"],
                p["expand"]["bn"]["scale"], p["expand"]["bn"]["bias"],
                s["expand"]["bn"]["mean"], s["expand"]["bn"]["var"], BN_EPS,
            )
        w_dw, b_dw = _fold(
            p["depthwise"]["conv"]["kernel"],
            p["depthwise"]["bn"]["scale"], p["depthwise"]["bn"]["bias"],
            s["depthwise"]["bn"]["mean"], s["depthwise"]["bn"]["var"], BN_EPS,
        )
        # (k, k, 1, Cmid) -> (k, k, Cmid) for the per-channel tap weights.
        blk["depthwise"] = (w_dw[:, :, 0, :], b_dw)
        blk["se_reduce"] = (
            p["se"]["reduce"]["kernel"][0, 0].astype(np.float32),
            p["se"]["reduce"]["bias"].astype(np.float32),
        )
        blk["se_expand"] = (
            p["se"]["expand"]["kernel"][0, 0].astype(np.float32),
            p["se"]["expand"]["bias"].astype(np.float32),
        )
        blk["project"] = _fold(
            p["project"]["conv"]["kernel"],
            p["project"]["bn"]["scale"], p["project"]["bn"]["bias"],
            s["project"]["bn"]["mean"], s["project"]["bn"]["var"], BN_EPS,
        )
        blocks.append(blk)
    folded["blocks"] = blocks
    folded["head"] = fold_cba("head")
    if "feature_projection" in params:
        folded["proj"] = (
            params["feature_projection"]["kernel"].astype(np.float32),
            params["feature_projection"]["bias"].astype(np.float32),
        )
    else:
        folded["proj"] = None
    return folded


def _quantize_wb(entry):
    """(w, b) -> (w_int8, scale_f32, b): symmetric per-output-channel
    int8 over the trailing (output) axis; bias stays float32."""
    w, b = entry
    w = np.asarray(w, np.float32)
    absmax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = (absmax / 127.0).astype(np.float32)
    scale = np.where(scale == 0.0, 1.0, scale)
    w_q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return w_q, scale, np.asarray(b, np.float32)


def quantize_folded(folded: dict) -> dict:
    """int8-WEIGHT variant of a folded bundle (w8a16/w8a32): every conv /
    SE / projection weight is stored int8 with per-output-channel scales
    and dequantized at use. A reduced-precision path — it sits behind the
    0.999-cosine device numerics gate like bf16 (CLAUDE.md invariant).

    Measured context (docs/perf_roofline.md §3.3): the trunk is
    activation-HBM-bound; per chunk iteration the f32 weights are ~21 MB
    against ~3-4 GB of activation traffic, so int8 weights attack <1% of
    the bound. The A/B harness carries the measured verdict."""
    out: dict[str, Any] = {
        "stem": _quantize_wb(folded["stem"]),
        "head": _quantize_wb(folded["head"]),
        "proj": (
            _quantize_wb(folded["proj"]) if folded["proj"] is not None
            else None
        ),
    }
    blocks = []
    for blk in folded["blocks"]:
        q: dict[str, Any] = {"meta": blk["meta"]}
        for name in ("expand", "depthwise", "se_reduce", "se_expand",
                     "project"):
            if name in blk:
                q[name] = _quantize_wb(blk[name])
        blocks.append(q)
    out["blocks"] = blocks
    return out


def _wb(entry, dtype):
    """Unpack a folded weight entry to (w in ``dtype``, b float32) —
    transparently dequantizing int8 entries (w_q * per-channel scale in
    f32, then cast once to the compute dtype)."""
    if len(entry) == 3:
        w_q, scale, b = entry
        w = (jnp.asarray(w_q).astype(jnp.float32) * scale).astype(dtype)
        return w, b
    w, b = entry
    return jnp.asarray(w).astype(dtype), b


def _block_name(config: EfficientNetConfig, flat_idx: int) -> str:
    i = 0
    for stage_idx, (_, _, repeats, _, _) in enumerate(config.stages):
        for block_idx in range(repeats):
            if i == flat_idx:
                return f"stage{stage_idx}_block{block_idx}"
            i += 1
    raise IndexError(flat_idx)


# ---------------------------------------------------------------------------
# Pallas fused block (stride 1)
# ---------------------------------------------------------------------------


def _fused_block_kernel(
    x_ref, wexp_ref, bexp_ref, wdw_ref, bdw_ref,
    wse1_ref, bse1_ref, wse2_ref, bse2_ref, wproj_ref, bproj_ref,
    out_ref, buf_ref,
    *, hw: int, w: int, k: int, residual: bool, has_expand: bool,
    act_dtype, dw_layout: str, acc_dtype,
):
    """One grid step = ``block_b`` patches through a full stride-1 MBConv.

    Two depthwise layouts (measured head-to-head on-chip):

    - ``flat_masked``: buf rows mirror the compact HW layout (stride w);
      tap (dy, dx) is the static slice at dy*w + dx, and columns that
      would wrap across row boundaries are masked per dx (that mask IS
      the horizontal zero pad).
    - ``flat_padded``: buf rows use stride w+2p with real zero columns
      between rows, so taps at dy*(w+2p) + dx need no masks; the expand
      output is written in h row-strips instead of one block.

    Border zeros are written once (first grid step) and never touched
    again; interiors are overwritten every step.
    """
    import jax.experimental.pallas as pl
    import jax.lax as lax

    p = (k - 1) // 2
    f32 = jnp.float32
    w2 = w + 2 * p
    h = hw // w

    @pl.when(pl.program_id(0) == 0)
    def _():
        # Zero once: the interior is overwritten every grid step, the
        # border zeros (the spatial padding) persist across steps.
        buf_ref[...] = jnp.zeros(buf_ref.shape, act_dtype)

    x = x_ref[...]  # (B, HW, Cin)
    b, _, cin = x.shape

    # Expand 1x1 (+bias +SiLU) on the MXU, f32 accumulation. Rank-3
    # dot_general contracts the channel dim directly — merging (B, HW)
    # with a reshape is an unsupported Mosaic shape cast whenever HW is
    # not sublane-aligned (e.g. 49 or 196 at bf16). Without an expansion
    # the depthwise consumes the block input directly (no activation),
    # matching the MBConv layout.
    if has_expand:
        z = lax.dot_general(
            x, wexp_ref[...],
            (((2,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        z = jax.nn.silu(z + bexp_ref[...][None, None, :])
    else:
        z = x.astype(f32)
    cmid = z.shape[-1]
    z = z.astype(act_dtype)  # (B, HW, Cmid)

    if dw_layout == "flat_padded":
        # True zero columns between rows: map position (y, x) lives at
        # buf row (y+p)*w2 + (x+p), and EVERYTHING through the project
        # matmul stays w2-strided (hw2 = h*w2 rows, of which the
        # x >= w tail of each row is junk that never reaches the
        # output). Taps need no masks; the junk rows are excluded from
        # the SE mean by one precomputed row mask and dropped by the
        # per-row-strip output writes.
        hw2 = h * w2
        base = p * w2 + p
        for y in range(h):
            buf_ref[:, base + y * w2 : base + y * w2 + w, :] = (
                z[:, y * w : (y + 1) * w, :]
            )
        acc = jnp.zeros((b, hw2, cmid), acc_dtype) + bdw_ref[...][
            None, None, :
        ].astype(acc_dtype)
        for dy in range(k):
            for dx in range(k):
                term = buf_ref[:, dy * w2 + dx : dy * w2 + dx + hw2, :]
                tap = wdw_ref[dy * k + dx, :][None, None, :].astype(acc_dtype)
                acc = acc + term.astype(acc_dtype) * tap
        d = jax.nn.silu(acc.astype(f32))  # (B, HW2, Cmid) f32

        # SE over the real interior only (junk rows masked out).
        col2 = jax.lax.broadcasted_iota(jnp.int32, (1, hw2, 1), 1) % w2
        interior = (col2 < w).astype(f32)
        s = jnp.sum(d * interior, axis=1) / float(hw)  # (B, Cmid)
        r = jax.nn.silu(
            lax.dot_general(
                s, wse1_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            + bse1_ref[...][None, :]
        )
        e = jax.nn.sigmoid(
            lax.dot_general(
                r, wse2_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            + bse2_ref[...][None, :]
        )
        m = (d * e[:, None, :]).astype(act_dtype)
        y_full = lax.dot_general(
            m, wproj_ref[...],
            (((2,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + bproj_ref[...][None, None, :]
        xr = x if residual else None
        for y in range(h):
            strip = y_full[:, y * w2 : y * w2 + w, :]
            if xr is not None:
                strip = strip + xr[:, y * w : (y + 1) * w, :].astype(f32)
            out_ref[:, y * w : (y + 1) * w, :] = strip.astype(act_dtype)
        return
    else:
        base = p * w + p
        buf_ref[:, base : base + hw, :] = z
        col = jax.lax.broadcasted_iota(jnp.int32, (1, hw, 1), 1) % w
        acc = jnp.zeros((b, hw, cmid), acc_dtype) + bdw_ref[...][
            None, None, :
        ].astype(acc_dtype)
        for dy in range(k):
            for dx in range(k):
                term = buf_ref[:, dy * w + dx : dy * w + dx + hw, :]
                valid = (col >= p - dx) & (col < w + p - dx)
                tap = wdw_ref[dy * k + dx, :][None, None, :].astype(acc_dtype)
                acc = acc + jnp.where(
                    valid, term, jnp.zeros((), act_dtype)
                ).astype(acc_dtype) * tap
        d = jax.nn.silu(acc.astype(f32))  # (B, HW, Cmid) f32

    # Squeeze-excite: f32 global mean, two tiny matmuls, sigmoid scale.
    s = jnp.mean(d, axis=1)  # (B, Cmid)
    r = jax.nn.silu(
        lax.dot_general(
            s, wse1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + bse1_ref[...][None, :]
    )
    e = jax.nn.sigmoid(
        lax.dot_general(
            r, wse2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + bse2_ref[...][None, :]
    )
    m = (d * e[:, None, :]).astype(act_dtype)

    # Project 1x1 (+bias), optional residual — rank-3 contraction, no
    # batch/spatial reshapes (see the expand note).
    y = lax.dot_general(
        m, wproj_ref[...],
        (((2,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + bproj_ref[...][None, None, :]
    if residual:
        y = y + x.astype(f32)
    out_ref[...] = y.astype(act_dtype)


def fused_mbconv(
    x: jnp.ndarray,
    blk: dict,
    *,
    block_b: int | None = None,
    dw_layout: str = "flat_masked",
    acc_dtype: Any = jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run one stride-1 MBConv block as a fused Pallas kernel.

    x: (P, H, W, Cin) activations (any float dtype; kept as-is).
    blk: one entry of ``fold_backbone(...)["blocks"]`` (stride must be 1).
    block_b: patches per grid step (defaults: 1 for large spatial, more
        for small maps so tiny blocks amortize grid/DMA overhead).
    dw_layout: "flat_masked" (compact rows + per-tap column masks) or
        "flat_padded" (zero columns between rows, maskless taps at the
        cost of w -> w+2p row padding through the block).
    acc_dtype: depthwise accumulator dtype (float32, or bfloat16 to
        halve accumulator traffic at a precision cost the device
        numerics gate must clear).
    Returns (P, H, W, Cout).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    meta: BlockMeta = blk["meta"]
    if meta.stride != 1:
        raise ValueError("fused_mbconv handles stride-1 blocks only")
    n, h, w, cin = x.shape
    if (h, w, cin) != (meta.h, meta.w, meta.in_channels):
        raise ValueError(
            f"input {x.shape} does not match block meta {meta}"
        )
    hw = h * w
    k = meta.kernel
    p = (k - 1) // 2
    cmid, cout = meta.mid_channels, meta.out_channels
    act_dtype = x.dtype

    if block_b is None:
        # VMEM-budgeted against the 16 MB scoped limit: padded buffer +
        # live kernel temporaries (f32 depthwise accumulator, f32 d,
        # scaled m — ~10 B/elem over the mid tensor) + double-buffered
        # in/out blocks, with headroom for Mosaic's own stack.
        act_bytes = jnp.dtype(act_dtype).itemsize
        wpad = w + 2 * p if dw_layout == "flat_padded" else w
        pad_rows_est = 2 * p + (h + 2 * p) * wpad
        lanes = -(-cmid // 128) * 128
        # ~20 B/elem over the mid tensor covers the f32 accumulator plus
        # the f32 expand/silu/project temporaries Mosaic keeps live
        # (measured: the 672-mid 14^2 block costs ~4.3 MB/patch scoped).
        per_patch = (
            pad_rows_est * lanes * act_bytes
            + 20 * hw * lanes
            + 2 * hw * (-(-cin // 128) * 128 + -(-cout // 128) * 128) * act_bytes
        )
        block_b = max(1, min(n, (10 * 1024 * 1024) // per_patch))
    # Mosaic's dot_general lowering flattens (B, rows) into the sublane
    # dim; that shape cast only lowers when B*rows is sublane-tile
    # aligned (observed: 4x196 compiles, 4x49 does not). The flat_padded
    # layout runs its dots over h*(w+2p) rows, so the guard uses the
    # layout's actual extent. B=1 merges only a unit dim — always legal.
    dot_rows = (hw // w) * (w + 2 * p) if dw_layout == "flat_padded" else hw
    while block_b > 1 and ((block_b * dot_rows) % 16 or n % block_b):
        block_b -= 1
    grid = (n // block_b,)

    if meta.has_expand:
        wexp, bexp = _wb(blk["expand"], jnp.float32)
        wexp = wexp[0, 0]  # (1,1,Cin,Cmid) -> (Cin,Cmid)
    else:
        wexp = np.zeros((cin, cmid), np.float32)
        bexp = np.zeros((cmid,), np.float32)
    wdw, bdw = _wb(blk["depthwise"], jnp.float32)
    wdw = wdw.reshape(k * k, cmid)
    wse1, bse1 = _wb(blk["se_reduce"], jnp.float32)
    wse2, bse2 = _wb(blk["se_expand"], jnp.float32)
    wproj, bproj = _wb(blk["project"], jnp.float32)
    wproj = wproj[0, 0]  # (1,1,Cmid,Cout) -> (Cmid,Cout)

    if dw_layout == "flat_padded":
        w2 = w + 2 * p
        pad_rows = 2 * p + (h + 2 * p) * w2
    elif dw_layout == "flat_masked":
        pad_rows = 2 * p + (h + 2 * p) * w
    else:
        raise ValueError(f"unknown dw_layout {dw_layout!r}")

    kernel = functools.partial(
        _fused_block_kernel,
        hw=hw, w=w, k=k, residual=meta.residual,
        has_expand=meta.has_expand, act_dtype=act_dtype,
        dw_layout=dw_layout, acc_dtype=jnp.dtype(acc_dtype),
    )

    def wspec(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_b, hw, cin), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            wspec(wexp.shape), wspec(bexp.shape),
            wspec(wdw.shape), wspec(bdw.shape),
            wspec(wse1.shape), wspec(bse1.shape),
            wspec(wse2.shape), wspec(bse2.shape),
            wspec(wproj.shape), wspec(bproj.shape),
        ],
        out_specs=pl.BlockSpec(
            (block_b, hw, cout), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hw, cout), act_dtype),
        scratch_shapes=[pltpu.VMEM((block_b, pad_rows, cmid), act_dtype)],
        interpret=interpret,
    )(
        x.reshape(n, hw, cin),
        jnp.asarray(wexp), jnp.asarray(bexp),
        jnp.asarray(wdw), jnp.asarray(bdw),
        jnp.asarray(wse1), jnp.asarray(bse1),
        jnp.asarray(wse2), jnp.asarray(bse2),
        jnp.asarray(wproj), jnp.asarray(bproj),
    )
    return out.reshape(n, h, w, cout)


# ---------------------------------------------------------------------------
# Folded XLA forward (reference path for the fused kernel + fallback for
# stem / stride-2 blocks / head)
# ---------------------------------------------------------------------------


def _conv1x1(x, w, b, dtype):
    """1x1 conv over NHWC, emitting ``dtype`` like the flax trunk does.

    Two full-trunk lessons are baked in (measured on v5e, bf16):
    einsum/dot_general 1x1s lose ~8 us/patch to the conv form (the
    reshapes defeat XLA's layout pipeline), and `preferred_element_type
    =float32` loses ~20 us/patch across the trunk — the f32 conv
    outputs double every materialized activation in an HBM-bound
    program. The MXU still accumulates f32 internally; only the
    materialized result dtype matters here."""
    y = jax.lax.conv_general_dilated(
        x, w[None, None].astype(dtype), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(dtype)


def _dw_taps(z, w_dw, b_dw, kernel, stride, acc_dtype=jnp.float32,
             pads=None):
    """Depthwise conv as an explicit tap sum: k^2 static (optionally
    strided) slices of the zero-padded input, each scaled by its
    per-channel tap weight.

    Measured on v5e: XLA's native k=5 depthwise emitter is the trunk's
    per-FLOP worst case (8.0 us/patch for the 672-channel 14^2 block);
    the same math as a fused static-slice elementwise chain runs 2.2x
    faster (3.7 us/patch) because XLA fuses the taps into one VPU pass
    (docs/perf_roofline.md §3.1). Works unchanged for stride 2.
    acc_dtype=float32 accumulates exactly; the activation dtype halves
    the accumulator's materialized bytes at a precision cost the device
    numerics gate arbitrates.
    """
    n, h, w, c = z.shape
    if pads is None:
        p = (kernel - 1) // 2
        pads = ((p, p), (p, p))
    s = stride
    zp = jnp.pad(z, ((0, 0), pads[0], pads[1], (0, 0)))
    h_out = (h - 1) // s + 1
    w_out = (w - 1) // s + 1
    acc = jnp.zeros((n, h_out, w_out, c), acc_dtype) + b_dw.astype(acc_dtype)
    for dy in range(kernel):
        for dx in range(kernel):
            tap = jax.lax.slice(
                zp,
                (0, dy, dx, 0),
                (n, dy + (h_out - 1) * s + 1, dx + (w_out - 1) * s + 1, c),
                (1, s, s, 1),
            )
            acc = acc + tap.astype(acc_dtype) * w_dw[dy, dx].astype(acc_dtype)
    return acc


def _block_xla(x, blk, dtype, *, dw_taps_kernels: tuple = (),
               dw_pallas_kernels: tuple = (), interpret: bool = False,
               padding_mode: str = "symmetric"):
    """One MBConv block with folded weights, plain XLA ops.

    dw_taps_kernels: depthwise kernel sizes routed through the tap-sum
    schedule instead of the native conv (k=5 wins big; k=3 native is
    already near-free — see _dw_taps).
    dw_pallas_kernels: kernel sizes routed through the Pallas
    static-slice depthwise (stride-1 symmetric-pad blocks only —
    ops/depthwise.py); others fall through to the rules above.
    """
    from mermaid_classifier_tpu.models.efficientnet import conv_padding

    meta: BlockMeta = blk["meta"]
    inp = x
    if meta.has_expand:
        w, b = _wb(blk["expand"], jnp.float32)
        z = jax.nn.silu(_conv1x1(x, w[0, 0], b, dtype)).astype(dtype)
    else:
        z = x
    w_dw, b_dw = _wb(blk["depthwise"], jnp.float32)
    k = meta.kernel
    pads = conv_padding(k, meta.stride, z.shape[1], z.shape[2], padding_mode)
    if (
        k in dw_pallas_kernels and meta.stride == 1
        # stride-1 odd-k SAME pads are symmetric in both modes
    ):
        from mermaid_classifier_tpu.ops.depthwise import (
            depthwise_conv_pallas,
        )

        # Emits the activation dtype (f32 accumulation inside the kernel),
        # same as the native-conv branch — never materialize above it.
        z = depthwise_conv_pallas(
            z, w_dw, b_dw, kernel=k, interpret=interpret
        )
    elif k in dw_taps_kernels:
        z = _dw_taps(z, w_dw, b_dw, k, meta.stride, pads=pads)
    else:
        z = jax.lax.conv_general_dilated(
            z,
            w_dw[:, :, :, None].transpose(0, 1, 3, 2).astype(dtype),
            window_strides=(meta.stride, meta.stride),
            padding=pads,
            feature_group_count=meta.mid_channels,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b_dw.astype(dtype)
    z = jax.nn.silu(z).astype(dtype)
    # Squeeze-excite.
    s = jnp.mean(z.astype(jnp.float32), axis=(1, 2))  # (N, Cmid)
    w1, b1 = _wb(blk["se_reduce"], jnp.float32)
    w2, b2 = _wb(blk["se_expand"], jnp.float32)
    r = jax.nn.silu(s @ w1 + b1)
    e = jax.nn.sigmoid(r @ w2 + b2)
    z = (z * e[:, None, None, :].astype(dtype)).astype(dtype)
    w, b = _wb(blk["project"], jnp.float32)
    y = _conv1x1(z, w[0, 0], b, dtype).astype(dtype)
    if meta.residual:
        y = y + inp
    return y


def _stem_im2col(x, w, b, dtype):
    """The stem (3->32, k3, s2) as explicit im2col: 9 static strided
    slices concatenated into 27 channels, then a single 1x1 matmul.

    A 3-channel input conv is XLA's implicit-GEMM worst case on TPU
    (K=27 against the 128-wide MXU plus a thin-channel relayout); the
    measured native stem is 7.4 us/patch — 17% of the whole trunk for
    ~2% of its FLOPs (docs/perf_roofline.md §3.1)."""
    n, h, _, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h_out = h // 2
    cols = [
        jax.lax.slice(
            xp,
            (0, dy, dx, 0),
            (n, dy + 2 * h_out - 1, dx + 2 * h_out - 1, 3),
            (1, 2, 2, 1),
        )
        for dy in range(3)
        for dx in range(3)
    ]
    z = jnp.concatenate(cols, axis=-1)  # (N, H/2, W/2, 27)
    wmat = jnp.asarray(w).reshape(27, -1)  # (ky,kx,cin) row order == taps
    return jax.nn.silu(_conv1x1(z, wmat, b, dtype)).astype(dtype)


def _run_block(x, blk, dtype, *, fused, interpret, dw_taps_kernels,
               dw_pallas_kernels, padding_mode):
    """One MBConv block under the schedule options (shared by the full
    forward and the prefix/suffix seam — a single copy of the dispatch)."""
    meta: BlockMeta = blk["meta"]
    if fused and fusable(meta):
        # Stride-1 odd-kernel SAME padding is symmetric in BOTH modes
        # (total = k-1 splits evenly), so the fused kernel's baked-in
        # (p, p) taps are correct regardless of config.padding.
        return fused_mbconv(x, blk, interpret=interpret)
    return _block_xla(
        x, blk, dtype, dw_taps_kernels=dw_taps_kernels,
        dw_pallas_kernels=dw_pallas_kernels, interpret=interpret,
        padding_mode=padding_mode,
    )


def apply_folded_prefix(
    folded: dict,
    config: EfficientNetConfig,
    x: jnp.ndarray,
    n_blocks: int,
    *,
    fused: bool = False,
    interpret: bool = False,
    dw_taps_kernels: tuple = (),
    dw_pallas_kernels: tuple = (),
    stem_im2col: bool = False,
) -> jnp.ndarray:
    """Stem + the first ``n_blocks`` MBConv blocks of the folded trunk.

    Pairs with ``apply_folded_suffix`` to split the trunk at a block
    boundary — the seam the two-phase extraction schedule uses (scan the
    big-map shallow stages per chunk, run the small-map deep stages
    whole-batch). ``apply_folded_suffix(apply_folded_prefix(x, k), k)``
    equals ``apply_folded(x)`` exactly (tests/ops/test_fused_mbconv.py);
    ``apply_folded`` itself IS that composition at k=0, so there is one
    copy of the stem/block/head code.
    """
    from mermaid_classifier_tpu.models.efficientnet import conv_padding

    mode = config.padding
    dtype = jnp.dtype(config.compute_dtype)
    x = x.astype(dtype)
    w, b = _wb(folded["stem"], jnp.float32)
    if (
        stem_im2col and config.stages and x.shape[1] % 2 == 0
        and mode == "symmetric"  # the im2col slices bake p=(1,1)
    ):
        x = _stem_im2col(x, w, b, dtype)
    else:
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(w).astype(dtype),
            window_strides=(2, 2),
            padding=conv_padding(3, 2, x.shape[1], x.shape[2], mode),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.silu(x + b.astype(dtype)).astype(dtype)
    for blk in folded["blocks"][:n_blocks]:
        x = _run_block(
            x, blk, dtype, fused=fused, interpret=interpret,
            dw_taps_kernels=dw_taps_kernels,
            dw_pallas_kernels=dw_pallas_kernels, padding_mode=mode,
        )
    return x


def apply_folded_suffix(
    folded: dict,
    config: EfficientNetConfig,
    x: jnp.ndarray,
    n_blocks: int,
    *,
    fused: bool = False,
    interpret: bool = False,
    dw_taps_kernels: tuple = (),
    dw_pallas_kernels: tuple = (),
) -> jnp.ndarray:
    """MBConv blocks ``n_blocks:`` + head + pool + projection."""
    mode = config.padding
    dtype = jnp.dtype(config.compute_dtype)
    x = x.astype(dtype)
    for blk in folded["blocks"][n_blocks:]:
        x = _run_block(
            x, blk, dtype, fused=fused, interpret=interpret,
            dw_taps_kernels=dw_taps_kernels,
            dw_pallas_kernels=dw_pallas_kernels, padding_mode=mode,
        )
    w, b = _wb(folded["head"], jnp.float32)
    x = jax.nn.silu(_conv1x1(x, w[0, 0], b, dtype)).astype(dtype)
    x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    if folded["proj"] is not None:
        w, b = _wb(folded["proj"], jnp.float32)
        x = x @ w + b
    return x


def apply_folded(
    folded: dict,
    config: EfficientNetConfig,
    x: jnp.ndarray,
    *,
    fused: bool = False,
    interpret: bool = False,
    dw_taps_kernels: tuple = (),
    dw_pallas_kernels: tuple = (),
    stem_im2col: bool = False,
) -> jnp.ndarray:
    """Full backbone forward over folded weights.

    The defaults are the measured v5e fast path: BN folded into the
    convs, native XLA conv schedules, activations materialized in the
    compute dtype — 39.1 us/patch vs the flax trunk's 43.3 (bf16,
    docs/perf_roofline.md §3.2). fused=True swaps the eligible stride-1
    blocks for the VMEM-fused Pallas kernels (kept for measurement —
    XLA wins in-context); dw_taps_kernels / stem_im2col select the
    alternative tap-sum / im2col schedules, which win in isolated
    single-op probes but LOSE in the full trunk where XLA's own
    schedule overlaps better — both retained with their numbers so the
    negative result stays reproducible.
    """
    opts = dict(
        fused=fused, interpret=interpret,
        dw_taps_kernels=dw_taps_kernels,
        dw_pallas_kernels=dw_pallas_kernels,
    )
    x = apply_folded_prefix(
        folded, config, x, 0, stem_im2col=stem_im2col, **opts
    )
    return apply_folded_suffix(folded, config, x, 0, **opts)
