"""Test harness configuration.

Forces JAX onto the host CPU platform with 8 virtual devices BEFORE jax
initializes, so multi-chip sharding paths (mesh/pjit/shard_map) are testable
without TPU hardware. Bench and production paths run on the real chip; tests
never do.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _xla_flags:
    os.environ["XLA_FLAGS"] = (
        _xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
