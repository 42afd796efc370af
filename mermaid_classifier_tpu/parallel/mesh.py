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


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> None:
    """Join this process into a multi-host JAX runtime
    (``jax.distributed.initialize``): after it returns, ``jax.devices()``
    is the GLOBAL device list across all hosts and every collective in the
    `parallel/` layer spans them.

    This is the growth seam SURVEY.md §5.8 names for scaling past one
    host: the reference scales out by fanning independent workers over an
    object store (reference: scripts/launch_processing.py:59-124, kept
    here as `jobs/`), which remains the production path for extraction;
    a jax-level multi-host mesh is what head training or any future
    gradient-synchronized workload would use instead.

    All arguments fall back to the standard env vars / cluster
    auto-detection (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID, or a supported cluster environment). Safe to call on a
    single process (num_processes=1) — and idempotent: a second call is a
    no-op instead of an error.
    """
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def make_multihost_mesh(model_parallel: int | None = None) -> Mesh:
    """Build the (data, model) mesh over ALL processes' devices.

    Requires ``initialize_distributed`` (or single-process, where it
    degrades to ``make_mesh``). Axis layout policy for multi-host: the
    model axis must stay INSIDE a host (its alternating column/row-
    parallel collectives run every layer and need ICI bandwidth), while
    the data axis may span hosts (its gradients sync once per step, DCN
    tolerates that) — so the mesh is built hybrid: DCN dimension maps
    onto the data axis only.
    """
    n_local = jax.local_device_count()
    n_total = jax.device_count()
    n_procs = max(1, n_total // max(n_local, 1))
    if n_procs == 1:
        return make_mesh(model_parallel=model_parallel)
    if model_parallel is None:
        model_parallel = _largest_pow2_divisor(n_local, cap=2)
    if n_local % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} must divide the per-host"
            f" device count {n_local} (the model axis cannot cross DCN)"
        )
    try:
        # TPU pods: lay (data, model) onto ICI per slice and put the DCN
        # dimension on the data axis.
        mesh_devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(n_local // model_parallel, model_parallel),
            dcn_mesh_shape=(n_procs, 1),
        )
    except ValueError:
        # Backends without slice metadata (the multi-process CPU dryrun):
        # group devices by process so the model axis never crosses a
        # process boundary and consecutive data rows stay process-local.
        import numpy as np

        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        mesh_devices = np.array(devs).reshape(
            n_total // model_parallel, model_parallel
        )
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))
