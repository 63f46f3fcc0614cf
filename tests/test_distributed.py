"""Multi-host tests: single-process degenerate cases on the virtual mesh,
the profiler-trace smoke test, and a REAL two-process `jax.distributed`
run (coordinator on localhost, 4 virtual CPU devices per process) that
executes the sharded episode across the process boundary — the multi-host
analog of the reference's multi-process formation graph
(`launch/three_qd_nmpc_formation.launch:3-14`)."""

import os
import socket
import subprocess
import sys

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


def test_two_process_sharded_episode():
    """Two coordinator-joined processes (gloo CPU collectives), global
    8-device (data=4, swarm=2) mesh: a psum over the process-spanning data
    axis plus the REAL sharded closed-loop episode, each worker asserting
    its addressable metric shards against the single-process reference.
    See `tests/_distributed_worker.py` for the worker body."""
    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid}: ok" in out, out


def test_profiler_trace(tmp_path):
    import jax.numpy as jnp

    from ndp_nmpc_qd_tpu.utils.metrics import trace

    with trace(str(tmp_path)):
        x = jnp.ones((64, 64))
        jax.block_until_ready(x @ x)
    # a profile directory must have been produced
    import os

    assert any(os.scandir(tmp_path))
