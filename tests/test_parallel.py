"""Mesh sharding tests on the 8-device virtual CPU mesh: the sharded swarm
step must agree with an unsharded replay, and the graft entry points must
compile and run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ndp_nmpc_qd_tpu.models.quadrotor import hover_input, hover_state
from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.parallel.mesh import make_mesh, make_sharded_swarm_step
from ndp_nmpc_qd_tpu.solver.rti import make_rti_controller


@pytest.fixture(scope="module")
def setup():
    cfg = NdpNmpcConfig()
    ctl = make_rti_controller(cfg.ocp, cfg.vehicle, with_disturbance=True)
    N = cfg.ocp.N_node
    S, D = 4, 4
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (S, D, 3), jnp.float64, -1.0, 1.0)
    x0 = hover_state(pos)
    xr_lead = jnp.tile(
        hover_state(jnp.zeros((S, 3), jnp.float64))[:, None, :], (1, N + 1, 1)
    )
    ur_lead = jnp.tile(
        hover_input(cfg.vehicle, (S,), jnp.float64)[:, None, :], (1, N, 1)
    )
    offsets = jnp.zeros((S, D, 3), jnp.float64).at[:, :, 2].set(
        jnp.arange(D, dtype=jnp.float64) * 0.7
    )
    xr = jnp.broadcast_to(xr_lead[:, None], (S, D, N + 1, 10)).at[..., 0:3].add(
        offsets[:, :, None, :]
    )
    ur = jnp.broadcast_to(ur_lead[:, None], (S, D, N, 4))
    rti0 = jax.vmap(jax.vmap(ctl.reset))(xr, ur)
    return cfg, ctl, rti0, x0, xr_lead, ur_lead, offsets


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8, swarm_axis=2)
    assert mesh.shape == {"data": 4, "swarm": 2}


def test_sharded_step_matches_unsharded(setup):
    cfg, ctl, rti0, x0, xr_lead, ur_lead, offsets = setup
    from ndp_nmpc_qd_tpu.sim.downwash_truth import analytic_downwash

    mesh = make_mesh(8, swarm_axis=2)
    step = make_sharded_swarm_step(cfg, ctl, mesh)

    put = lambda spec, t: jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, spec)), t
    )
    u0_s, rti_s, n_ok = step(
        put(P("data", "swarm"), rti0),
        put(P("data", "swarm"), x0),
        put(P("data"), xr_lead),
        put(P("data"), ur_lead),
        put(P("data", "swarm"), offsets),
    )

    # unsharded replay of the same semantics
    S, D = x0.shape[:2]
    N = cfg.ocp.N_node
    rel = x0[:, None, :, 0:6] - x0[:, :, None, 0:6]
    f_pair = analytic_downwash(rel)
    f_pair = jnp.where(jnp.all(rel == 0.0, axis=-1, keepdims=True), 0.0, f_pair)
    f_now = jnp.sum(f_pair, axis=2)
    f_dist = jnp.broadcast_to(f_now[:, :, None, :], (S, D, N + 1, 3))
    xr = jnp.broadcast_to(xr_lead[:, None], (S, D, N + 1, 10)).at[..., 0:3].add(
        offsets[:, :, None, :]
    )
    ur = jnp.broadcast_to(ur_lead[:, None], (S, D, N, 4))
    u0_r, rti_r, info_r = jax.vmap(jax.vmap(ctl.update))(rti0, x0, xr, ur, f_dist)

    np.testing.assert_allclose(np.asarray(u0_s), np.asarray(u0_r), atol=1e-9)
    np.testing.assert_array_equal(
        np.asarray(n_ok), np.sum(np.asarray(info_r.ok), axis=1)
    )


def test_graft_entry_compiles():
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    u0, xbar, ok = out
    assert u0.shape == (8, 3, 4)
    assert bool(jnp.all(jnp.isfinite(u0)))


def test_graft_dryrun_multichip():
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g

    g.dryrun_multichip(8)
