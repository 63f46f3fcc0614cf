"""Multi-host helper tests (single-process degenerate cases on the virtual
mesh) and the profiler-trace smoke test."""

import jax
import numpy as np

from ndp_nmpc_qd_tpu.parallel.distributed import (
    initialize,
    make_global_mesh,
    process_local_batch,
)


def test_initialize_noop_single_process():
    initialize()  # must not raise or spawn anything


def test_global_mesh_shapes():
    mesh = make_global_mesh(swarm_axis=2)
    assert mesh.shape == {"data": 4, "swarm": 2}
    mesh1 = make_global_mesh(swarm_axis=1)
    assert mesh1.shape == {"data": 8, "swarm": 1}


def test_process_local_batch():
    assert process_local_batch(4096) == 4096  # single process


def test_profiler_trace(tmp_path):
    import jax.numpy as jnp

    from ndp_nmpc_qd_tpu.utils.metrics import trace

    with trace(str(tmp_path)):
        x = jnp.ones((64, 64))
        jax.block_until_ready(x @ x)
    # a profile directory must have been produced
    import os

    assert any(os.scandir(tmp_path))
