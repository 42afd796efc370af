"""Production-geometry preflight: AOT-lower + compile the real sharded
programs at REAL shapes, no data, no execution.

The multichip dryrun executes tiny shapes to prove the sharded paths run;
this module proves the PRODUCTION geometries *partition and compile* on a
given mesh before any fleet time is committed — the step a deployment
actually needs (SPMD partitioners fail on real shapes in ways toy shapes
never see: uneven tiling, padded-dim propagation, HBM over-subscription).
Compilation needs only avals, so the report costs seconds on a virtual CPU
mesh and never allocates the multi-GB buffers whose shapes it proves.

Programs covered (the three legs the C2 + extraction drives run):

- data-parallel B0 224^2 folded-backbone extraction (the bucket lane,
  reference analog: scripts/build_feature_bucket.py);
- the int8 (or f32/bf16) device-resident scan-epoch training program at the
  realized C2 subsample scale, buffer ROW-SHARDED over the mesh
  (train/mlp_classifier.py partial_fit_resident's mesh path);
- the shipped artifact's calibrated head over the full val span, batch
  sharded (parallel/sharded_serve.py).

Every program is built by the SAME factory the production path calls —
nothing here re-declares a graph, so the compile proof covers the code that
runs, not a look-alike.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: The C2 production geometry (docs/runs/full_recipe_*: realized balanced
#: subsample 449,099 rows x 4096-dim features, 80 BAGF classes, the
#: (500, 300, 100) production head, ~44.9k-row val span for the
#: eval-the-artifact head pass, B0 extraction at backbone_batch 128).
C2_GEOMETRY = {
    "n_rows": 449_099,
    "dim": 4096,
    "n_classes": 80,
    "hidden": (500, 300, 100),
    "resident_dtype": "int8",
    "val_rows": 44_910,
    "extract_batch": 128,
}


def _mem_report(compiled) -> dict:
    """Compiled-program memory analysis, tolerant of backends that do not
    implement it (the proof is the compile itself; bytes are bonus)."""
    try:
        ma = compiled.memory_analysis()
        return {
            "argument_mb": round(ma.argument_size_in_bytes / 1e6, 1),
            "output_mb": round(ma.output_size_in_bytes / 1e6, 1),
            "temp_mb": round(ma.temp_size_in_bytes / 1e6, 1),
        }
    except Exception:  # noqa: BLE001 — advisory
        return {}


def production_geometry_report(
    mesh: Mesh, geometry: dict | None = None
) -> dict:
    """AOT-lower + compile the three production programs on ``mesh`` at
    ``geometry`` (default: the C2 production geometry). Returns a report
    dict; raises on any lowering/partitioning/compile failure."""
    geo = dict(C2_GEOMETRY)
    geo.update(geometry or {})
    n_devices = mesh.devices.size
    report: dict[str, Any] = {"devices": int(n_devices), "geometry": geo}
    replicated = NamedSharding(mesh, P())

    def repl_avals(tree):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                           sharding=replicated),
            tree,
        )

    def repl_shardings(tree):
        return jax.tree.map(lambda _: replicated, tree)

    # --- leg 1: dp B0 extraction at (extract_batch, 224, 224, 3) -------------
    from mermaid_classifier_tpu.models.efficientnet import (
        EfficientNetConfig,
        init_backbone_params,
    )
    from mermaid_classifier_tpu.ops.fused_mbconv import (
        apply_folded,
        fold_backbone,
    )

    config = EfficientNetConfig()
    t0 = time.perf_counter()
    folded_avals = jax.eval_shape(
        lambda: fold_backbone(init_backbone_params(0, config), config)
    )
    batch = int(geo["extract_batch"])
    if batch % n_devices:
        raise ValueError(
            f"extract_batch {batch} must divide the {n_devices}-device mesh"
        )
    batch_sharding = NamedSharding(mesh, P(mesh.axis_names, None, None, None))
    extract = jax.jit(
        lambda params, patches: apply_folded(params, config, patches),
        in_shardings=(repl_shardings(folded_avals), batch_sharding),
        out_shardings=NamedSharding(mesh, P(mesh.axis_names, None)),
    )
    compiled = extract.lower(
        repl_avals(folded_avals),
        jax.ShapeDtypeStruct(
            (batch, config.patch_size, config.patch_size, 3),
            jnp.float32, sharding=batch_sharding,
        ),
    ).compile()
    report["extract_b0"] = {
        "batch": batch,
        "patch": config.patch_size,
        "compile_seconds": round(time.perf_counter() - t0, 1),
        **_mem_report(compiled),
    }

    # --- leg 2: the resident scan-epoch program at C2 scale -------------------
    from mermaid_classifier_tpu.train.mlp_classifier import (
        MLPClassifier,
        _make_optimizer,
        _make_resident_epoch_fn,
    )

    t0 = time.perf_counter()
    n_rows = int(geo["n_rows"])
    dim = int(geo["dim"])
    n_classes = int(geo["n_classes"])
    sizes = (dim, *geo["hidden"], n_classes)
    dtype = str(geo["resident_dtype"])
    quantized = dtype == "int8"
    jdtype = jnp.dtype(dtype)
    # The mesh resident path's exact padding rules
    # (set_resident_features: rows pad to the device-count multiple;
    # partial_fit_resident: sklearn-auto minibatch, mini-batch rows pad to
    # the device-count multiple).
    rows_padded = n_rows + (-n_rows % n_devices)
    batch_size = min(200, n_rows)  # _resolve_batch_size("auto")
    batch_padded = batch_size + (-batch_size % n_devices)
    n_batches = -(-n_rows // batch_size)
    clf_defaults = MLPClassifier(geo["hidden"])
    epoch_fn = _make_resident_epoch_fn(
        n_batches, sizes,
        float(clf_defaults.learning_rate_init),
        float(clf_defaults.beta_1), float(clf_defaults.beta_2),
        float(clf_defaults.epsilon), float(clf_defaults.alpha),
        mesh, quantized,
    )
    w_avals = [
        jax.ShapeDtypeStruct((i, o), jnp.float32, sharding=replicated)
        for i, o in zip(sizes[:-1], sizes[1:])
    ]
    b_avals = [
        jax.ShapeDtypeStruct((o,), jnp.float32, sharding=replicated)
        for o in sizes[1:]
    ]
    params_aval = {"W": w_avals, "b": b_avals}
    opt = _make_optimizer(
        float(clf_defaults.learning_rate_init), float(clf_defaults.beta_1),
        float(clf_defaults.beta_2), float(clf_defaults.epsilon),
    )
    opt_state_aval = jax.eval_shape(opt.init, params_aval)
    x_aval = jax.ShapeDtypeStruct(
        (rows_padded, dim), jdtype,
        sharding=NamedSharding(mesh, P(mesh.axis_names, None)),
    )
    scale_aval = jax.ShapeDtypeStruct(
        (rows_padded,), jnp.float32,
        sharding=NamedSharding(mesh, P(mesh.axis_names)),
    )
    ys_dtype = jnp.int16 if n_classes <= 32767 else jnp.int32
    batch_avals = (
        jax.ShapeDtypeStruct((n_batches, batch_padded), jnp.int32),
        jax.ShapeDtypeStruct((n_batches, batch_padded), ys_dtype),
        jax.ShapeDtypeStruct((n_classes,), jnp.float32),
        jax.ShapeDtypeStruct((n_batches,), jnp.float32),
    )
    if quantized:
        compiled = epoch_fn.lower(
            params_aval, opt_state_aval, x_aval, scale_aval, *batch_avals
        ).compile()
    else:
        compiled = epoch_fn.lower(
            params_aval, opt_state_aval, x_aval, *batch_avals
        ).compile()
    report["resident_epoch"] = {
        "rows": n_rows,
        "rows_padded": rows_padded,
        "dim": dim,
        "dtype": dtype,
        "n_batches": n_batches,
        "batch_rows": batch_padded,
        "buffer_gb_per_device": round(
            rows_padded * dim * jdtype.itemsize / n_devices / 1e9, 2
        ),
        "compile_seconds": round(time.perf_counter() - t0, 1),
        **_mem_report(compiled),
    }

    # --- leg 3: the shipped head over the full val span, batch-sharded -------
    from mermaid_classifier_tpu.inference.head import head_apply

    t0 = time.perf_counter()
    val_rows = int(geo["val_rows"])
    val_padded = val_rows + (-val_rows % n_devices)
    head_aval = {
        "weights": [
            jax.ShapeDtypeStruct((i, o), jnp.float32, sharding=replicated)
            for i, o in zip(sizes[:-1], sizes[1:])
        ],
        "biases": [
            jax.ShapeDtypeStruct((o,), jnp.float32, sharding=replicated)
            for o in sizes[1:]
        ],
        "a": jax.ShapeDtypeStruct((n_classes,), jnp.float32,
                                  sharding=replicated),
        "b": jax.ShapeDtypeStruct((n_classes,), jnp.float32,
                                  sharding=replicated),
    }
    feat_sharding = NamedSharding(mesh, P(mesh.axis_names, None))
    serve = jax.jit(
        head_apply,
        in_shardings=(repl_shardings(head_aval), feat_sharding),
        out_shardings=feat_sharding,
    )
    compiled = serve.lower(
        head_aval,
        jax.ShapeDtypeStruct((val_padded, dim), jnp.float32,
                             sharding=feat_sharding),
    ).compile()
    report["serve_head"] = {
        "rows": val_rows,
        "rows_padded": val_padded,
        "n_classes": n_classes,
        "compile_seconds": round(time.perf_counter() - t0, 1),
        **_mem_report(compiled),
    }
    return report
