"""Grouped formation-swarm episode (sim/swarm_scale.py) must reproduce the
single-swarm episode exactly: with zero placement, S grouped swarms == S
vmapped three_qd_ndp episodes."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.sim.closed_loop import make_episode
from ndp_nmpc_qd_tpu.sim.swarm_scale import grid_placement, make_formation_swarm


def _traj():
    from ndp_nmpc_qd_tpu.traj.polyopt import fit_waypoints

    t = np.linspace(0, 2 * np.pi, 5)
    wpts = np.stack(
        [1.2 * np.sin(t), 0.6 * np.sin(2 * t), 1.0 + 0.2 * np.sin(t)], axis=-1
    )
    return fit_waypoints(wpts, np.full(4, 2.0), 0.1 * np.sin(t))


def _params(dtype):
    from ndp_nmpc_qd_tpu.models.downwash_mlp import load_npz

    return load_npz(
        os.path.join(
            os.path.dirname(__file__), "..", "assets",
            "downwash_analytic_sn4.npz",
        ),
        dtype=dtype,
    )


def test_grouped_matches_single_swarm():
    cfg = NdpNmpcConfig()
    traj = _traj()
    dtype = jnp.float64
    S, G = 2, 3
    n_ticks, hold = 120, 40
    dw = _params(dtype)

    init_g, _, run_g = make_formation_swarm(
        cfg, traj, n_swarms=S, drones_per_swarm=G, use_ndp=True,
        downwash_params=dw, true_downwash=True, hold_ticks=hold,
        placement=np.zeros((S, 3)), solver_backend="jax",
    )
    st_g, m_g, _ = jax.jit(lambda s: run_g(s, n_ticks))(init_g(dtype=dtype))

    init_1, _, run_1 = make_episode(
        cfg, traj, n_drones=G, use_ndp=True, downwash_params=dw,
        true_downwash=True, hold_ticks=hold, solver_backend="jax",
    )
    st1 = init_1(dtype=dtype)
    st1 = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (S,) + a.shape), st1)
    _, m_1 = jax.jit(jax.vmap(lambda s: run_1(s, n_ticks)[:2]))(st1)

    for name in ("pos_rmse", "yaw_rmse_deg", "form_rmse"):
        np.testing.assert_allclose(
            np.asarray(getattr(m_g, name)).reshape(S, G),
            np.asarray(getattr(m_1, name)),
            atol=1e-9,
            err_msg=name,
        )
    np.testing.assert_array_equal(
        np.asarray(m_g.ok).reshape(S, G), np.asarray(m_1.ok)
    )
    assert float(np.max(np.asarray(m_g.pos_rmse))) < 0.2
    assert np.asarray(m_g.ok).all()


def test_grid_placement_separates_swarms():
    """With grid placement the swarms remain independent (identical metrics
    across swarms up to float noise) and all healthy."""
    cfg = NdpNmpcConfig()
    traj = _traj()
    dtype = jnp.float64
    S, G = 4, 3
    init_g, _, run_g = make_formation_swarm(
        cfg, traj, n_swarms=S, drones_per_swarm=G, use_ndp=True,
        downwash_params=_params(dtype), true_downwash=True, hold_ticks=30,
        placement=grid_placement(S), solver_backend="jax",
    )
    _, m, _ = jax.jit(lambda s: run_g(s, 100))(init_g(dtype=dtype))
    pos = np.asarray(m.pos_rmse).reshape(S, G)
    assert np.asarray(m.ok).all()
    # every swarm behaves the same (placement is a translation; tolerance
    # covers float rounding of the shifted coordinates)
    assert float(np.max(np.abs(pos - pos[0]))) < 1e-4, pos


def test_grouped_sharded_matches_unsharded():
    """The grouped formation swarm under `make_sharded_episode` (the
    4096-drone formation config is no longer single-chip-only): sharded over
    the (data, swarm) mesh == the grouped unsharded vmap."""
    from ndp_nmpc_qd_tpu.parallel.episode import make_sharded_episode
    from ndp_nmpc_qd_tpu.parallel.mesh import make_mesh

    cfg = NdpNmpcConfig()
    traj = _traj()
    dtype = jnp.float64
    S, G, SC = 2, 3, 4  # 2 groups x 3 drones, 4 scenarios
    n_ticks, hold = 80, 30
    kw = dict(
        n_groups=S, anchors=grid_placement(S), use_ndp=True,
        downwash_params=_params(dtype), true_downwash=True, hold_ticks=hold,
        qp_iters=8, solver_backend="jax",
    )

    init_fn, _, run_fn = make_episode(cfg, traj, n_drones=S * G, **kw)
    st0 = init_fn(dtype=dtype)
    st0 = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (SC,) + a.shape), st0)
    _, m_ref = jax.jit(jax.vmap(lambda s: run_fn(s, n_ticks)[:2]))(st0)

    mesh = make_mesh(8, swarm_axis=2)  # drones 6 split 2-way, scenarios 4-way
    init_s, run_s = make_sharded_episode(
        cfg, traj, mesh, n_drones=S * G, scenario_batch=SC, **kw
    )
    _, m_s, _ = run_s(init_s(dtype=dtype), n_ticks)

    for name in ("pos_rmse", "yaw_rmse_deg", "form_rmse"):
        np.testing.assert_allclose(
            np.asarray(getattr(m_s, name)),
            np.asarray(getattr(m_ref, name)),
            rtol=0, atol=1e-9, err_msg=name,
        )
    np.testing.assert_array_equal(np.asarray(m_s.ok), np.asarray(m_ref.ok))
    assert np.asarray(m_ref.ok).all()
    assert float(np.max(np.asarray(m_ref.pos_rmse))) < 0.3
