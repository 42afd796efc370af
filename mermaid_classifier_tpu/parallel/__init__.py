"""Multi-chip parallelism: device meshes, sharded training, sharded extraction.

The reference scales by fanning independent workers over SageMaker with S3 as
the coordination plane (reference: scripts/launch_processing.py:59-124,
SURVEY.md §2.2, §5.8) — it has no collective backend at all. The TPU-native
growth path is the idiomatic JAX one instead: a `jax.sharding.Mesh` over the
chips, `NamedSharding` annotations on the hot functions, and XLA-inserted
collectives riding ICI. This package holds that layer:

- ``mesh``            — mesh construction helpers (data x model axes);
- ``sharded_extract`` — data-parallel backbone feature extraction;
- ``sharded_train``   — data+tensor-parallel MLP-head training step.
"""

from mermaid_classifier_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    make_mesh,
)
from mermaid_classifier_tpu.parallel.sharded_extract import (  # noqa: F401
    make_sharded_feature_fn,
)
from mermaid_classifier_tpu.parallel.sharded_train import (  # noqa: F401
    ShardedHeadTrainer,
)
