"""Worker process for the two-process `jax.distributed` CPU test.

Launched by `tests/test_distributed.py::test_two_process_sharded_episode`
as two coordinator-joined processes (localhost), each exposing 4 virtual
CPU devices, for a global 8-device (data=4, swarm=2) mesh — the multi-host
analog of the reference's multi-process formation graph
(`launch/three_qd_nmpc_formation.launch:3-14`: one OS process per drone,
exchanging horizons over TCPROS).

Each worker:
  1. joins the coordination service (`parallel.distributed.initialize`),
  2. builds the global mesh (`make_global_mesh`),
  3. runs a cross-process `psum` over the "data" axis (which spans the
     process boundary by construction) and checks the value,
  4. runs the REAL sharded closed-loop episode (`make_sharded_episode`)
     over the global mesh and asserts its locally-addressable metric
     shards equal the single-process vmap reference computed in-process.

Exit code 0 == all assertions passed; the parent test checks both workers.
"""

import os
import sys

# before importing jax: 4 virtual CPU devices per process
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
flags = " ".join(
    f for f in flags.split() if "xla_force_host_platform_device_count" not in f
)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# cross-process collectives on the CPU backend
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = int(sys.argv[3])

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from ndp_nmpc_qd_tpu.parallel.distributed import (
        initialize,
        make_global_mesh,
        process_local_batch,
    )

    initialize(
        coordinator=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4

    mesh = make_global_mesh(swarm_axis=2)
    assert mesh.shape == {"data": 2 * nproc, "swarm": 2}

    # --- 1. collective across the process boundary ---------------------
    # data axis rows 0..1 live on process 0, rows 2..3 on process 1 (the
    # mesh groups each host's devices contiguously), so a psum over "data"
    # must cross DCN (here: the gloo transport between the two workers).
    n_data = mesh.shape["data"]
    sh = NamedSharding(mesh, P("data", "swarm"))
    x = jax.jit(
        lambda: jnp.arange(n_data * 2, dtype=jnp.float64).reshape(n_data, 2),
        out_shardings=sh,
    )()
    total = jax.jit(
        jax.shard_map(
            lambda a: jax.lax.psum(a, "data"), mesh=mesh,
            in_specs=P("data", "swarm"), out_specs=P(None, "swarm"),
        )
    )(x)
    expect = np.arange(n_data * 2, dtype=np.float64).reshape(n_data, 2).sum(0)
    np.testing.assert_allclose(np.asarray(total)[0], expect)

    # --- 2. the REAL sharded episode over the global mesh --------------
    from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
    from ndp_nmpc_qd_tpu.parallel.episode import make_sharded_episode
    from ndp_nmpc_qd_tpu.sim.closed_loop import make_episode
    from ndp_nmpc_qd_tpu.traj.polyopt import fit_waypoints

    t = np.linspace(0, 2 * np.pi, 4)
    wpts = np.stack(
        [1.0 * np.sin(t), 0.5 * np.sin(2 * t), 1.0 + 0.1 * np.sin(t)], axis=-1
    )
    traj = fit_waypoints(wpts, np.full(3, 2.0), np.zeros(4))

    cfg = NdpNmpcConfig()
    dtype = jnp.float64
    S, D = 4, 2
    n_ticks, hold = 30, 10
    kw = dict(hold_ticks=hold, qp_iters=4, solver_backend="jax")
    assert process_local_batch(S) == S // nproc

    rng = np.random.default_rng(3)
    perturb = rng.uniform(-0.05, 0.05, size=(S, D, 3))

    # single-process vmap reference (computed identically in every worker)
    init_fn, _, run_fn = make_episode(cfg, traj, n_drones=D, **kw)
    st0 = init_fn(dtype=dtype)
    st0 = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (S,) + a.shape), st0)
    st0 = st0._replace(
        plant=st0.plant._replace(
            x=st0.plant.x.at[..., 0:3].add(jnp.asarray(perturb, dtype))
        )
    )
    _, m_ref = jax.jit(jax.vmap(lambda s: run_fn(s, n_ticks)[:2]))(st0)

    init_s, run_s = make_sharded_episode(
        cfg, traj, mesh, n_drones=D, scenario_batch=S, **kw
    )
    st_s0 = init_s(dtype=dtype, perturb=perturb)
    _, m_s, _ = run_s(st_s0, n_ticks)

    # each process checks its addressable shards against the reference
    n_checked = 0
    for name in ("pos_rmse", "yaw_rmse_deg"):
        ref = np.asarray(getattr(m_ref, name))
        for shard in getattr(m_s, name).addressable_shards:
            np.testing.assert_allclose(
                np.asarray(shard.data), ref[shard.index], rtol=0, atol=1e-9,
                err_msg=f"{name} shard {shard.index}",
            )
            n_checked += 1
    assert n_checked >= 2, n_checked
    ok_ref = np.asarray(m_ref.ok)
    for shard in m_s.ok.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data), ok_ref[shard.index])
    assert ok_ref.all()
    assert float(np.max(np.asarray(m_ref.pos_rmse))) < 0.5

    print(f"worker {pid}: ok ({n_checked} metric shards checked)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
