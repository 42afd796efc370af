"""Resident-buffer storage-dtype A/B: upload throughput + numerics gate.

The training lane's dominant one-time cost at production scale is the
multi-GB resident-feature upload (docs/perf_roofline.md §4); storage
dtype is the lever (f32 -> bf16 halves the wire bytes, -> int8 quarters
them). Link weather varies ~8-40 MB/s ACROSS sessions (CLAUDE.md), so
dtypes are only comparable inside ONE process on one link window — this
harness uploads the same matrix at each requested dtype back-to-back
through the production slab-write path (MLPClassifier._chunked_device_put:
~256 MB donated-buffer slabs, scalar-readback fence per slab) and reports
rows/s, wall seconds, and per-wire-byte MB/s side by side.

It also runs the house 0.999-cosine numerics gate on the chip for every
reduced-precision dtype: same trained params, resident forward over the
rounded buffer vs host f32 forward (the bf16 analog measured 0.99999 on
chip; reference device-numerics discipline:
build_feature_bucket.py:451-502).

    python -m mermaid_classifier_tpu.experiments.resident_ab \
        --rows 100000 --dim 4096 --dtypes float32 bfloat16 int8

Prints one JSON line; nothing is persisted — paste results into
docs/perf_roofline.md / docs/training.md with the run info.
"""

from __future__ import annotations

import argparse
import json
import time


def _upload_once(X, dtype: str) -> dict:
    import jax
    import numpy as np

    from mermaid_classifier_tpu.train.mlp_classifier import MLPClassifier

    row_scale = None
    if dtype == "int8":
        row_scale = MLPClassifier._int8_row_scales(X)
    import jax.numpy as jnp

    jdtype = jnp.dtype(dtype)
    t0 = time.perf_counter()
    buf = MLPClassifier._chunked_device_put(
        X, dtype=jdtype, row_scale=row_scale
    )
    # The per-slab fences make the final slab the last transfer; one more
    # scalar readback closes the window (tunnel: block_until_ready lies).
    float(jnp.asarray(buf)[0, 0])
    seconds = time.perf_counter() - t0
    wire_bytes = X.shape[0] * X.shape[1] * jdtype.itemsize
    del buf
    return {
        "dtype": dtype,
        "seconds": round(seconds, 2),
        "rows_per_sec": round(X.shape[0] / seconds, 1),
        "wire_mb": round(wire_bytes / 1e6, 1),
        "wire_mbps": round(wire_bytes / 1e6 / seconds, 1),
    }


def _cosine_gate(dtype: str, rows: int = 2048, dim: int = 256) -> float:
    """Same-params resident-vs-host forward min cosine on THIS backend."""
    import numpy as np

    from mermaid_classifier_tpu.train.mlp_classifier import MLPClassifier

    rng = np.random.default_rng(0)
    k = 8
    centers = rng.normal(0, 3, size=(k, dim)).astype(np.float32)
    y_idx = rng.integers(0, k, rows)
    X = (centers[y_idx] + rng.normal(0, 0.5, (rows, dim))).astype(np.float32)
    y = np.asarray([f"c{i}" for i in y_idx])
    clf = MLPClassifier((64, 32), learning_rate_init=1e-2, random_state=0)
    clf.set_resident_features(X, dtype=dtype)
    idx = np.arange(rows)
    for _ in range(2):
        clf.partial_fit_resident(idx, y, classes=sorted(set(y.tolist())))
    p_res = clf.predict_proba_resident(idx[:512])
    p_host = clf.predict_proba(X[:512])
    num = np.sum(p_res * p_host, axis=1)
    den = np.linalg.norm(p_res, axis=1) * np.linalg.norm(p_host, axis=1)
    return float(np.min(num / np.maximum(den, 1e-12)))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--rows", type=int, default=100_000)
    parser.add_argument("--dim", type=int, default=4096)
    parser.add_argument("--dtypes", nargs="+",
                        default=["float32", "bfloat16", "int8"],
                        choices=("float32", "bfloat16", "int8"))
    parser.add_argument("--repeats", type=int, default=1,
                        help="upload passes per dtype (interleaved"
                        " round-robin so weather drift hits every dtype"
                        " equally; per-dtype result is the best pass)")
    parser.add_argument("--skip-gate", action="store_true")
    args = parser.parse_args(argv)

    import numpy as np

    rng = np.random.default_rng(7)
    # Realistic feature-like values: non-negative with heavy zeros (the
    # backbone features are post-ReLU pooled activations).
    X = np.maximum(
        rng.normal(0.2, 1.0, size=(args.rows, args.dim)), 0.0
    ).astype(np.float32)

    passes: dict[str, list[dict]] = {d: [] for d in args.dtypes}
    for _ in range(args.repeats):
        for dtype in args.dtypes:
            res = _upload_once(X, dtype)
            passes[dtype].append(res)
            print(f"  pass: {res}", flush=True)

    result = {
        "rows": args.rows,
        "dim": args.dim,
        "upload": {
            d: max(p, key=lambda r: r["rows_per_sec"])
            for d, p in passes.items()
        },
    }
    if "float32" in result["upload"]:
        base = result["upload"]["float32"]["rows_per_sec"]
        result["speedup_vs_f32"] = {
            d: round(r["rows_per_sec"] / base, 2)
            for d, r in result["upload"].items()
        }
    if not args.skip_gate:
        result["min_cosine_gate"] = {
            d: round(_cosine_gate(d), 6)
            for d in args.dtypes if d != "float32"
        }
        result["gate_pass"] = all(
            v >= 0.999 for v in result["min_cosine_gate"].values()
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
