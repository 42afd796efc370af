"""Test harness configuration.

Forces JAX onto the host CPU platform with 8 virtual devices BEFORE any test
imports jax, so multi-chip sharding paths (mesh/pjit/shard_map) are testable
without TPU hardware. Bench and production paths run on the real chip; tests
never do.

NOTE: in this environment the axon TPU plugin ignores the JAX_PLATFORMS env
var, so the CPU pin must go through jax.config.update (env vars alone leave
every jitted test op round-tripping through the TPU tunnel at ~1 s/compile).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _xla_flags:
    os.environ["XLA_FLAGS"] = (
        _xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
