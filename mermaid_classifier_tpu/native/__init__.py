"""Native (C++) runtime components and their Python bindings.

The compute path is JAX/XLA/Pallas; this package holds the host-side native
pieces of the runtime (SURVEY.md §2.3): currently the packed-feature-cache
batch gatherer (``fastbatch``). Everything degrades gracefully to a numpy
fallback when no C++ toolchain is available.
"""

from mermaid_classifier_tpu.native.fastbatch import (  # noqa: F401
    PackedFeatureCache,
    PackedFeatureCacheWriter,
    native_available,
)
