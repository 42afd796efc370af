"""Batch-sharded serving: the calibrated head over a device mesh.

The serve shape is a batch of feature vectors -> calibrated probabilities
(reference: annotation.py:249-261 classifies all of an image's points in
one predict_proba call). At scale that batch packs many images'
points (models/extractor.py serve-shape packing), so the throughput path
shards the batch dimension over every device in the mesh with the head
params replicated — the same embarrassing data parallelism as extraction,
no collectives. Numerics are identical to the single-device
``head_apply``: XLA splits the batch, each shard computes the same math.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mermaid_classifier_tpu.inference.head import HeadParams, head_apply
from mermaid_classifier_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def make_sharded_head_fn(
    mesh: Mesh, params: HeadParams
) -> Callable[[jnp.ndarray], np.ndarray]:
    """Build ``features (N, D) -> probabilities (N, K) float64`` with the
    batch sharded over the whole mesh and head params replicated.

    N must divide by the device count; the serve-shape packer upstream pads
    batches to fixed sizes, so callers already control N.
    """
    batch_sharding = NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS)))
    replicated = NamedSharding(mesh, P())

    tree = params.as_pytree()
    tree = jax.device_put(tree, jax.tree.map(lambda _: replicated, tree))

    apply_sharded = jax.jit(
        head_apply,
        in_shardings=(jax.tree.map(lambda _: replicated, tree), batch_sharding),
        out_shardings=batch_sharding,
    )

    n_total = mesh.devices.size
    input_dim = params.input_dim

    def run(features: jnp.ndarray) -> np.ndarray:
        features = jnp.asarray(features, jnp.float32)
        if features.ndim != 2 or features.shape[1] != input_dim:
            raise ValueError(
                f"features must be (N, {input_dim}); got {features.shape}."
            )
        if features.shape[0] % n_total != 0:
            raise ValueError(
                f"batch size {features.shape[0]} is not divisible by the"
                f" {n_total}-device mesh; pad to a multiple first."
            )
        return np.asarray(apply_sharded(tree, features), dtype=np.float64)

    return run


def load_sharded_predictor(artifact: "str | Path", mesh: Mesh):
    """A ``Predictor`` whose head runs batch-sharded over ``mesh``.

    Every loader gate runs first (the single-device ``load_predictor`` is
    the validation authority — schema, probe, class count); then the same
    npz parameters are re-wrapped in the mesh head. Arbitrary batch sizes
    are handled by weight-0-free padding: rows pad up to the device-count
    multiple and the pad rows are dropped before returning, so callers
    (e.g. the bulk feature classifier) see identical shapes either way.
    """
    from mermaid_classifier_tpu.inference.loader import (
        Predictor,
        load_predictor,
    )

    base = load_predictor(artifact)
    # Reuse the gate-validated params the loader already parsed — one npz
    # read, no coupling to loader internals.
    run = make_sharded_head_fn(mesh, base.head_params)
    n_devices = mesh.devices.size

    def head_fn(features: np.ndarray) -> np.ndarray:
        features = np.asarray(features, np.float32)
        pad = -len(features) % n_devices
        if pad:
            features = np.concatenate(
                [features, np.zeros((pad, features.shape[1]), np.float32)]
            )
        out = run(features)
        return out[: len(out) - pad] if pad else out

    return Predictor(head_fn, base.classes, base.input_dim)
