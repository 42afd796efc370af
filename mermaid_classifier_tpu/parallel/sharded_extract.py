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
    *,
    backbone_impl: str = "folded",
    prefolded: Any = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build ``patches (N, ps, ps, 3) -> features (N, D)`` with the batch
    sharded over every device in ``mesh`` and the backbone replicated.

    The per-shard forward follows ``backbone_impl``: "folded" (the
    BN-folded single-device fast path — docs/perf_roofline.md §3.2; the
    fold is batch-independent, so sharding the batch axis composes with
    it unchanged) or "flax" (the nn.Module forward, the parity
    reference).

    N must be divisible by the total device count (the extractor's
    fixed-batch bucketing upstream guarantees this; see
    models/extractor.py point_bucket/backbone_batch discipline).
    """
    config = config or EfficientNetConfig()

    if backbone_impl == "folded":
        from mermaid_classifier_tpu.ops.fused_mbconv import (
            apply_folded,
            fold_backbone,
        )

        # prefolded lets a caller that already folded the bundle (the
        # extractor) skip a second host-side fold.
        folded = prefolded if prefolded is not None else fold_backbone(
            variables, config
        )

        def forward(params, patches):
            return apply_folded(params, config, patches)

        params = folded
    elif backbone_impl == "flax":
        model = EfficientNetBackbone(config=config)
        forward = model.apply
        params = variables
    else:
        raise ValueError(
            f"backbone_impl must be folded|flax for the sharded forward,"
            f" got {backbone_impl!r}"
        )

    batch_spec = P((DATA_AXIS, MODEL_AXIS))
    batch_sharding = NamedSharding(mesh, batch_spec)
    replicated = NamedSharding(mesh, P())

    variables = jax.device_put(
        params, jax.tree.map(lambda _: replicated, params)
    )

    apply_sharded = jax.jit(
        forward,
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
