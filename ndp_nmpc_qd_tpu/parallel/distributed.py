"""Multi-host bootstrap: scenario scale-out across hosts over DCN.

Single-host meshes (parallel/mesh.py) shard scenarios/drones over the chips
of one slice via ICI. Across hosts, `jax.distributed.initialize` +
`jax.make_mesh` give a global device mesh whose outermost axis spans DCN;
scenario data parallelism (the dominant axis of this workload) maps onto it
with zero code change to the step functions — only the mesh and shardings
grow.

This module can't be exercised end-to-end in a single-host environment; its
logic is covered by construction (`make_global_mesh` degenerates to the
local mesh when world_size == 1, which tests assert) and the sharded step
itself is validated on the virtual CPU mesh.

Typical pod-slice launch (one process per host):

    from ndp_nmpc_qd_tpu.parallel.distributed import initialize, make_global_mesh
    initialize(coordinator="10.0.0.1:8476", num_processes=4, process_id=RANK)
    mesh = make_global_mesh(swarm_axis=4)   # (dcn*ici data axis, swarm axis)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Wrapper over jax.distributed.initialize; no-op when single-process
    (auto-detected on TPU pods via the environment)."""
    if num_processes in (None, 1) and coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(swarm_axis: int = 1) -> Mesh:
    """(data, swarm) mesh over ALL processes' devices.

    Device order groups each host's devices contiguously, so the data axis
    splits across hosts first (DCN) and within hosts second (ICI), while a
    swarm axis of up to devices-per-host stays inside one host's ICI domain
    — collectives for the horizon exchange never cross DCN.
    """
    devs = np.asarray(jax.devices())
    n = devs.size
    assert n % swarm_axis == 0, (n, swarm_axis)
    return Mesh(devs.reshape(n // swarm_axis, swarm_axis), ("data", "swarm"))


def process_local_batch(global_batch: int) -> int:
    """Scenarios this process should generate for an even global shard."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n
