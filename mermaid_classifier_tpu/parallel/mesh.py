"""Device-mesh construction for the extraction and training paths.

Layout policy: a 2-D ``(data, model)`` mesh. The data axis carries the batch
dimension (patches during extraction, samples during head training); the
model axis shards the MLP head's hidden dimension (Megatron-style alternating
column/row parallel — see sharded_train.py). Extraction is embarrassingly
data-parallel (the reference's only scale-out axis, SURVEY.md §2.2), so it
shards its batch over *both* axes flattened.

On real hardware ``mesh_utils.create_device_mesh`` lays the axes onto the ICI
topology; on the CPU test backend (8 virtual devices via
``xla_force_host_platform_device_count``) the same code paths compile and
execute, which is how multi-chip is validated without multi-chip hardware.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshSpec:
    """How many devices along each logical axis."""

    data: int
    model: int = 1

    @property
    def n_devices(self) -> int:
        return self.data * self.model


def _largest_pow2_divisor(n: int, cap: int) -> int:
    d = 1
    while d * 2 <= cap and n % (d * 2) == 0:
        d *= 2
    return d


def default_mesh_spec(n_devices: int, model_parallel: int | None = None) -> MeshSpec:
    """Pick a (data, model) factorization of ``n_devices``.

    The head's widest layer is 4096x500; model parallelism beyond a few-way
    split is all collective and no compute, so default to model<=2 and give
    everything else to the batch axis.
    """
    if n_devices < 1:
        raise ValueError(f"n_devices must be >= 1, got {n_devices}")
    if model_parallel is None:
        model_parallel = _largest_pow2_divisor(n_devices, cap=2)
    if n_devices % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} does not divide n_devices={n_devices}"
        )
    return MeshSpec(data=n_devices // model_parallel, model=model_parallel)


def make_mesh(
    n_devices: int | None = None,
    *,
    model_parallel: int | None = None,
    devices: list | None = None,
) -> Mesh:
    """Build a ``Mesh`` with axes ("data", "model") over the first
    ``n_devices`` available devices (all of them when None)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices but only {len(devices)} available"
        )
    spec = default_mesh_spec(n_devices, model_parallel)
    mesh_devices = mesh_utils.create_device_mesh(
        (spec.data, spec.model), devices=devices[: spec.n_devices]
    )
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))
