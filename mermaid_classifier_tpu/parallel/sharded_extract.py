"""Data-parallel feature extraction over a device mesh.

The reference's at-scale extraction is embarrassingly parallel: N independent
workers each run the backbone over their share of the images
(reference: scripts/launch_processing.py:59-124, SURVEY.md §2.2). On TPU the
intra-host analog is one jitted backbone forward whose batch dimension is
sharded over every chip in the mesh: XLA splits the batch, each chip runs its
shard, no collectives are needed (the backbone is replicated).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mermaid_classifier_tpu.models.efficientnet import (
    EfficientNetBackbone,
    EfficientNetConfig,
)
from mermaid_classifier_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def make_sharded_feature_fn(
    mesh: Mesh,
    variables: Any,
    config: EfficientNetConfig | None = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build ``patches (N, ps, ps, 3) -> features (N, D)`` with the batch
    sharded over every device in ``mesh`` and the backbone replicated.

    N must be divisible by the total device count (the extractor's
    fixed-batch bucketing upstream guarantees this; see
    models/extractor.py point_bucket/backbone_batch discipline).
    """
    config = config or EfficientNetConfig()
    model = EfficientNetBackbone(config=config)

    batch_spec = P((DATA_AXIS, MODEL_AXIS))
    batch_sharding = NamedSharding(mesh, batch_spec)
    replicated = NamedSharding(mesh, P())

    variables = jax.device_put(
        variables, jax.tree.map(lambda _: replicated, variables)
    )

    apply_sharded = jax.jit(
        model.apply,
        in_shardings=(jax.tree.map(lambda _: replicated, variables), batch_sharding),
        out_shardings=batch_sharding,
    )

    n_total = mesh.devices.size

    def run(patches: jnp.ndarray) -> jnp.ndarray:
        if patches.shape[0] % n_total != 0:
            raise ValueError(
                f"batch size {patches.shape[0]} is not divisible by the"
                f" {n_total}-device mesh; pad to a multiple first."
            )
        return apply_sharded(variables, patches)

    return run
