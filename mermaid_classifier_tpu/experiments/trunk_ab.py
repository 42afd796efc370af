"""Full-trunk A/B harness for backbone schedule experiments.

The one measurement discipline that settles schedule questions on this
hardware (docs/perf_roofline.md §1-3): isolated single-op probes INVERT
in context, so every candidate schedule is timed as the FULL chunk-scanned
extraction trunk — chained scalar carry, one readback, median of repeats.

    python -m mermaid_classifier_tpu.experiments.trunk_ab \
        --schedules folded folded+dwp5 folded+taps5

Schedule names: 'flax', 'folded', plus '+' suffixes on folded:
'+dwp5' (Pallas static-slice k5 depthwise, ops/depthwise.py),
'+taps5' (XLA tap-sum k5), '+im2col' (im2col stem), '+fused'
(VMEM-fused Pallas MBConv blocks). Results print as a table; nothing is
persisted — paste winners into docs/perf_roofline.md with the run info.
"""

from __future__ import annotations

import argparse
import time


def build_forward(schedule: str, model, variables, config):
    import jax

    if schedule == "flax":
        return model.apply, jax.device_put(variables)
    from mermaid_classifier_tpu.ops.fused_mbconv import (
        apply_folded,
        fold_backbone,
    )

    base, _, *mods = schedule.partition("+")
    if base != "folded":
        raise ValueError(f"unknown schedule base {base!r}")
    mods = mods[0].split("+") if mods and mods[0] else []
    kwargs: dict = {}
    quantize_w8 = False
    for mod in mods:
        if mod == "w8":
            # int8 weights with per-output-channel scales, dequantized at
            # use (w8a16) — a reduced-precision path behind the cosine
            # gate like bf16 (ops/fused_mbconv.quantize_folded).
            quantize_w8 = True
        elif mod in ("dwp5", "dwp3"):
            # Append (never overwrite) so '+dwp3+dwp5' routes BOTH kernel
            # sizes regardless of mod order.
            kwargs["dw_pallas_kernels"] = kwargs.get(
                "dw_pallas_kernels", ()
            ) + (int(mod[-1]),)
        elif mod == "taps5":
            kwargs["dw_taps_kernels"] = (5,)
        elif mod == "im2col":
            kwargs["stem_im2col"] = True
        elif mod == "fused":
            kwargs["fused"] = True
        else:
            raise ValueError(f"unknown schedule mod {mod!r}")

    bundle = fold_backbone(variables, config)
    if quantize_w8:
        from mermaid_classifier_tpu.ops.fused_mbconv import quantize_folded

        bundle = quantize_folded(bundle)
    folded = jax.device_put(bundle)

    def fwd(weights, patches):
        return apply_folded(weights, config, patches, **kwargs)

    return fwd, folded


def time_trunk(fwd, weights, config, *, points=1024, chunk=128, iters=6,
               warmup=2, repeats=3, image_size=1536, split=None):
    """bench.py's device-loop discipline, detached for experiments.

    split=k runs a TWO-PHASE schedule instead of ``fwd``: stem + the
    first k MBConv blocks scan per chunk (big spatial maps like the
    chunked working set), the stacked mid tensor then runs blocks k:
    + head WHOLE-BATCH (small maps might amortize better at full
    width) — the chunk-granularity-per-stage-group axis the flat sweep
    cannot reach.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mermaid_classifier_tpu.ops.patch_ops import (
        channel_scale_bias,
        extract_patches_xla,
    )

    ps = config.patch_size
    half = ps // 2
    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, (image_size, image_size, 3), dtype=np.uint8)
    padded = np.zeros((image_size + 2 * half, image_size + 2 * half, 3),
                      np.uint8)
    padded[half:-half, half:-half] = image
    scale, bias = channel_scale_bias(config.mean_rgb, config.std_rgb)
    n_chunks = points // chunk

    if split is None:
        @jax.jit
        def step(prev, weights, padded, starts3, scale, bias):
            def body(acc, starts):
                patches = extract_patches_xla(
                    padded, starts, ps, scale, bias,
                    out_dtype=jnp.dtype(config.compute_dtype),
                )
                return acc + jnp.sum(fwd(weights, patches)), None

            acc, _ = jax.lax.scan(body, prev, starts3)
            return acc
    else:
        from mermaid_classifier_tpu.ops.fused_mbconv import (
            apply_folded_prefix,
            apply_folded_suffix,
        )

        @jax.jit
        def step(prev, weights, padded, starts3, scale, bias):
            def body(_, starts):
                patches = extract_patches_xla(
                    padded, starts, ps, scale, bias,
                    out_dtype=jnp.dtype(config.compute_dtype),
                )
                return 0.0, apply_folded_prefix(
                    weights, config, patches, split
                )

            _, mids = jax.lax.scan(body, 0.0, starts3)
            mid = mids.reshape(-1, *mids.shape[2:])
            out = apply_folded_suffix(weights, config, mid, split)
            return prev + jnp.sum(out)

    n_inputs = warmup + iters
    starts = [
        jnp.asarray(rng.integers(0, image_size,
                                 (n_chunks, chunk, 2)).astype(np.int32))
        for _ in range(n_inputs)
    ]
    dp = jnp.asarray(padded)
    ds = jnp.asarray(scale)
    db = jnp.asarray(bias)
    acc = jnp.float32(0)
    for i in range(warmup):
        acc = step(acc, weights, dp, starts[i], ds, db)
    float(acc)
    runs = []
    for _ in range(repeats):
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for i in range(iters):
            acc = step(acc, weights, dp, starts[warmup + i], ds, db)
        float(acc)
        runs.append(points * iters / (time.perf_counter() - t0))
    return float(np.median(runs)), runs


def gate_cosine(fwd_ref, w_ref, fwd, weights, config, *, chunk=128):
    """Min per-patch feature cosine of ``fwd`` against the reference
    schedule on one chunk of random patches — the same device-numerics
    discipline as bench.py's dtype gate (CLAUDE.md: reduced-precision
    paths sit behind a 0.999-cosine check ON THE DEVICE, because host
    emulation does not reproduce MXU rounding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mermaid_classifier_tpu.ops.patch_ops import (
        channel_scale_bias,
        extract_patches_xla,
    )

    ps = config.patch_size
    half = ps // 2
    rng = np.random.default_rng(7)
    image_size = 512
    padded = np.zeros((image_size + 2 * half, image_size + 2 * half, 3),
                      np.uint8)
    padded[half:-half, half:-half] = rng.integers(
        0, 256, (image_size, image_size, 3), dtype=np.uint8
    )
    scale, bias = channel_scale_bias(config.mean_rgb, config.std_rgb)
    starts = jnp.asarray(
        rng.integers(0, image_size, (chunk, 2)).astype(np.int32)
    )

    # Two separate jits (the weight pytrees differ when quantized).
    ref = np.asarray(jax.jit(
        lambda w, p, s, sc, b: fwd_ref(w, extract_patches_xla(
            p, s, ps, sc, b, out_dtype=jnp.dtype(config.compute_dtype)
        )).astype(jnp.float32)
    )(w_ref, jnp.asarray(padded), starts, jnp.asarray(scale),
        jnp.asarray(bias)))
    cand = np.asarray(jax.jit(
        lambda w, p, s, sc, b: fwd(w, extract_patches_xla(
            p, s, ps, sc, b, out_dtype=jnp.dtype(config.compute_dtype)
        )).astype(jnp.float32)
    )(weights, jnp.asarray(padded), starts, jnp.asarray(scale),
        jnp.asarray(bias)))
    num = np.sum(ref * cand, axis=1)
    den = np.linalg.norm(ref, axis=1) * np.linalg.norm(cand, axis=1)
    return float(np.min(num / np.maximum(den, 1e-12)))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--schedules", nargs="+",
                        default=["folded", "folded+dwp5"])
    parser.add_argument("--points", type=int, default=1024)
    parser.add_argument("--chunk", type=int, default=128)
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--numerics-gate", action="store_true",
                        help="also check every non-first schedule's"
                        " features against the first schedule on-device"
                        " (min per-patch cosine, 0.999 pass line)")
    args = parser.parse_args(argv)

    import jax

    from mermaid_classifier_tpu.models.efficientnet import (
        EfficientNetBackbone,
        EfficientNetConfig,
        init_backbone_params,
    )

    print(f"backend: {jax.default_backend()}")
    config = EfficientNetConfig(compute_dtype=args.dtype)
    model = EfficientNetBackbone(config=config)
    variables = init_backbone_params(0, config)

    results = []
    gate_ref = None  # (fwd, weights) of the first schedule
    for schedule in args.schedules:
        split = None
        base_schedule = schedule
        if "+split" in schedule:
            base_schedule, _, tail = schedule.rpartition("+split")
            try:
                split = int(tail)
            except ValueError:
                raise ValueError(
                    f"bad schedule {schedule!r}: '+split' must end the"
                    " schedule with a block count, e.g. 'folded+split8'"
                    " (it does not compose with other mods)."
                ) from None
            if base_schedule != "folded":
                raise ValueError(
                    f"bad schedule {schedule!r}: '+splitN' composes with"
                    " the plain 'folded' base only (no other mods)."
                )
        fwd, weights = build_forward(base_schedule, model, variables, config)
        if args.numerics_gate and split is None:
            if gate_ref is None:
                gate_ref = (fwd, weights)
            else:
                cos = gate_cosine(
                    gate_ref[0], gate_ref[1], fwd, weights, config,
                    chunk=args.chunk,
                )
                verdict = "PASS" if cos >= 0.999 else "FAIL"
                print(f"{schedule:24s} numerics gate vs"
                      f" {args.schedules[0]}: min cosine {cos:.6f}"
                      f" [{verdict}]", flush=True)
        t0 = time.perf_counter()
        pps, runs = time_trunk(
            fwd, weights, config, points=args.points, chunk=args.chunk,
            iters=args.iters, repeats=args.repeats, split=split,
        )
        us = 1e6 / pps
        print(f"{schedule:24s} {us:7.1f} us/patch {pps:10,.0f} p/s"
              f"  runs={[f'{r:,.0f}' for r in runs]}"
              f"  (wall {time.perf_counter() - t0:.0f}s incl. compile)",
              flush=True)
        results.append((schedule, pps))
    best = max(results, key=lambda r: r[1])
    print(f"best: {best[0]} at {best[1]:,.0f} p/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
