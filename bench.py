"""Benchmark: 224^2 patch-feature extraction throughput on one chip.

Measures the production hot path — point-patch gather + normalize + B0
backbone forward to 4096-dim features (reference hot loop:
scripts/build_feature_bucket.py:415-446) — in steady state on the default
JAX device, and prints ONE JSON line:

    {"metric": "patch_features_per_sec", "value": N, "unit": "patches/s",
     "vs_baseline": N / 5000}

Baseline: the BASELINE.md north-star target of 5,000 patch-features/sec/chip
(the reference itself publishes no throughput numbers; SURVEY.md §6).

Usage: python bench.py [--points N] [--iters N] [--warmup N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

BASELINE_PATCHES_PER_SEC = 5000.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--points", type=int, default=1024,
                        help="points (patches) per step")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--image-size", type=int, default=1536)
    parser.add_argument(
        "--dtype", choices=("bfloat16", "float32"), default="bfloat16",
        help="backbone compute dtype; bfloat16 is the production extraction"
        " fast path, gated on the same >=0.999 cosine check the reference"
        " applies to its mps/cuda path (build_feature_bucket.py:451-502)",
    )
    args = parser.parse_args()

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

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    config = EfficientNetConfig(compute_dtype=args.dtype)  # production B0 -> 4096
    model = EfficientNetBackbone(config=config)
    variables = init_backbone_params(0, config)
    effective_dtype = args.dtype
    gate_cosine = None

    ps = config.patch_size
    half = ps // 2
    rng = np.random.default_rng(0)
    size = args.image_size
    image = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
    padded = np.zeros((size + 2 * half, size + 2 * half, 3), np.uint8)
    padded[half:-half, half:-half] = image
    scale, bias = channel_scale_bias(config.mean_rgb, config.std_rgb)

    @jax.jit
    def step(variables, padded, starts, scale, bias):
        patches = extract_patches_xla(padded, starts, ps, scale, bias)
        # Reduce to a scalar so timing can force completion with a tiny host
        # readback: under the tunneled axon backend block_until_ready returns
        # before the device finishes, so readback is the only honest fence.
        return jnp.sum(model.apply(variables, patches))

    n_inputs = args.warmup + args.iters
    starts_list = [
        jnp.asarray(rng.integers(0, size, size=(args.points, 2)).astype(np.int32))
        for _ in range(n_inputs)
    ]
    dv = jax.device_put(variables)
    dp = jnp.asarray(padded)
    ds = jnp.asarray(scale)
    db = jnp.asarray(bias)

    if args.dtype != "float32":
        # Numerics gate before extracting at reduced precision — the same
        # discipline as the reference's device-vs-CPU check
        # (build_feature_bucket.py:451-502), run device-vs-device against
        # the float32 graph on identical weights.
        model_f32 = EfficientNetBackbone(
            config=EfficientNetConfig(compute_dtype="float32")
        )
        probe = rng.random((8, ps, ps, 3)).astype(np.float32)
        ref = np.asarray(jax.jit(model_f32.apply)(variables, jnp.asarray(probe)))
        got = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(probe)))
        num = np.sum(ref * got, axis=1)
        den = np.linalg.norm(ref, axis=1) * np.linalg.norm(got, axis=1)
        worst = float(np.min(num / np.maximum(den, 1e-12)))
        log(f"{args.dtype} numerics gate: min cosine {worst:.6f} vs float32")
        gate_cosine = round(worst, 6)
        if worst < 0.999:
            # Never abort the bench: fall back to the always-valid f32 path
            # so a JSON result is still produced (the gate is the production
            # refusal; the bench's job is to report the best GATED number).
            log(
                f"{args.dtype} failed the 0.999 cosine gate ({worst:.6f});"
                " falling back to float32"
            )
            config = EfficientNetConfig(compute_dtype="float32")
            model = EfficientNetBackbone(config=config)
            effective_dtype = "float32"

    log(f"compiling + warmup ({args.warmup} steps, {args.points} patches/step)…")
    for i in range(max(args.warmup, 1)):
        float(step(dv, dp, starts_list[i], ds, db))

    # Steady state: enqueue every step (distinct inputs so nothing can be
    # deduplicated), then read each scalar back — the last readback cannot
    # complete before all enqueued compute has.
    t0 = time.perf_counter()
    sums = [
        step(dv, dp, starts_list[args.warmup + i], ds, db)
        for i in range(args.iters)
    ]
    for s in sums:
        float(s)
    elapsed = time.perf_counter() - t0

    patches_per_sec = args.points * args.iters / elapsed
    log(
        f"{args.iters} steps x {args.points} patches in {elapsed:.3f}s"
        f" -> {patches_per_sec:,.0f} patch-features/s"
    )
    print(json.dumps({
        "metric": "patch_features_per_sec",
        "value": round(patches_per_sec, 1),
        "unit": "patches/s",
        "vs_baseline": round(patches_per_sec / BASELINE_PATCHES_PER_SEC, 3),
        # Effective dtype actually measured (a failed gate falls back to
        # float32 — visible here, never silent) + the gate evidence.
        "dtype": effective_dtype,
        "numerics_gate_cosine": gate_cosine,
    }))


if __name__ == "__main__":
    main()
