"""The REAL episode sharded over the (data, swarm) mesh must reproduce the
unsharded episode exactly: same controller, estimator, plant, one-tick
PredXU exchange, and NDP gating — the gathers replace in-array indexing
one-for-one (VERDICT r1 item 1)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.parallel.episode import make_sharded_episode
from ndp_nmpc_qd_tpu.parallel.mesh import make_mesh
from ndp_nmpc_qd_tpu.sim.closed_loop import make_episode


def _traj():
    from ndp_nmpc_qd_tpu.traj.polyopt import fit_waypoints

    t = np.linspace(0, 2 * np.pi, 5)
    wpts = np.stack(
        [1.5 * np.sin(t), 0.7 * np.sin(2 * t), 1.0 + 0.2 * np.sin(t)], axis=-1
    )
    return fit_waypoints(wpts, np.full(4, 2.0), 0.15 * np.sin(t))


def _downwash_params(dtype):
    from ndp_nmpc_qd_tpu.models.downwash_mlp import load_npz

    path = os.path.join(
        os.path.dirname(__file__), "..", "assets", "downwash_analytic_sn4.npz"
    )
    return load_npz(path, dtype=dtype)


@pytest.mark.parametrize("swarm_axis", [2, 4])
def test_sharded_episode_matches_unsharded(swarm_axis):
    """Full mission (hold-calibrate + tracking) with NDP forecast, plant-side
    wake coupling, and the one-tick-delayed horizon exchange: sharded over
    (data, swarm) == unsharded vmap, over >=100 ticks."""
    cfg = NdpNmpcConfig()
    traj = _traj()
    dtype = jnp.float64
    S, D = 4, 4
    n_ticks = 140
    hold = 40
    kw = dict(
        use_ndp=True,
        downwash_params=_downwash_params(dtype),
        true_downwash=True,
        hold_ticks=hold,
        qp_iters=12,
        solver_backend="jax",
    )

    rng = np.random.default_rng(7)
    perturb = rng.uniform(-0.05, 0.05, size=(S, D, 3))

    # --- unsharded reference: vmap over scenarios ---
    init_fn, _, run_fn = make_episode(cfg, traj, n_drones=D, **kw)
    st0 = init_fn(dtype=dtype)
    st0 = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (S,) + a.shape), st0)
    st0 = st0._replace(
        plant=st0.plant._replace(
            x=st0.plant.x.at[..., 0:3].add(jnp.asarray(perturb, dtype))
        )
    )
    run_ref = jax.jit(jax.vmap(lambda s: run_fn(s, n_ticks)[:2]))
    st_ref, m_ref = run_ref(st0)

    # --- sharded: same program under shard_map on the virtual 8-mesh ---
    mesh = make_mesh(8, swarm_axis=swarm_axis)
    init_s, run_s = make_sharded_episode(
        cfg, traj, mesh, n_drones=D, scenario_batch=S, **kw
    )
    st_s0 = init_s(dtype=dtype, perturb=perturb)
    st_s, m_s, _ = run_s(st_s0, n_ticks)

    for name in ("pos_rmse", "yaw_rmse_deg", "form_rmse"):
        np.testing.assert_allclose(
            np.asarray(getattr(m_s, name)),
            np.asarray(getattr(m_ref, name)),
            rtol=0,
            atol=1e-9,
            err_msg=name,
        )
    np.testing.assert_array_equal(np.asarray(m_s.ok), np.asarray(m_ref.ok))
    np.testing.assert_allclose(
        np.asarray(st_s.plant.x), np.asarray(st_ref.plant.x), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(st_s.rti.x_bar), np.asarray(st_ref.rti.x_bar), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(st_s.est.x), np.asarray(st_ref.est.x), atol=1e-12
    )
    # the mission actually tracked (not a degenerate hold)
    assert float(np.max(np.asarray(m_ref.pos_rmse))) < 0.2
    assert np.asarray(m_ref.ok).all()


def test_sharded_independent_swarm():
    """four_qd/swarm semantics (independent drones) under the same sharding:
    no exchange, but the hold-ref gather and metrics still line up."""
    cfg = NdpNmpcConfig()
    traj = _traj()
    dtype = jnp.float64
    S, D = 2, 8
    n_ticks = 60
    kw = dict(independent=True, hold_ticks=20, solver_backend="jax")

    init_fn, _, run_fn = make_episode(cfg, traj, n_drones=D, **kw)
    st0 = init_fn(dtype=dtype)
    st0 = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (S,) + a.shape), st0)
    run_ref = jax.jit(jax.vmap(lambda s: run_fn(s, n_ticks)[:2]))
    _, m_ref = run_ref(st0)

    mesh = make_mesh(8, swarm_axis=4)
    init_s, run_s = make_sharded_episode(
        cfg, traj, mesh, n_drones=D, scenario_batch=S, **kw
    )
    _, m_s, _ = run_s(init_s(dtype=dtype), n_ticks)

    np.testing.assert_allclose(
        np.asarray(m_s.pos_rmse), np.asarray(m_ref.pos_rmse), atol=1e-9
    )
    np.testing.assert_array_equal(np.asarray(m_s.ok), np.asarray(m_ref.ok))
