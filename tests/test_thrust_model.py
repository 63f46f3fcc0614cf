"""Motor-thrust model + controller tests: allocation physics, hover
equilibrium, derivative checks, and closed-loop tracking — the capability
the reference stubs (`nmpc_motor_thrust_ctl.py:11-13`)."""

import jax
import jax.numpy as jnp
import numpy as np

from ndp_nmpc_qd_tpu.models.quadrotor_thrust import (
    hover_thrust,
    rotor_thrust_bounds,
    thrust_allocation_matrix,
    thrust_dynamics,
)
from ndp_nmpc_qd_tpu.models.quadrotor import hover_state
from ndp_nmpc_qd_tpu.ops.integrators import make_discrete_dynamics
from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.solver.ocp_thrust import (
    make_thrust_rti_controller,
    thrust_refs_from_bodyrate,
)
from ndp_nmpc_qd_tpu.traj.refgen import nmpc_refs
from ndp_nmpc_qd_tpu.traj.polyopt import fit_waypoints

CFG = NdpNmpcConfig()
VEH = CFG.vehicle
OCP = CFG.ocp


def x13(pos, dtype=jnp.float64):
    return jnp.concatenate(
        [hover_state(jnp.asarray(pos, dtype)), jnp.zeros(3, dtype)]
    )


def test_allocation_matrix_physics():
    A = np.asarray(thrust_allocation_matrix(VEH))
    h = hover_thrust(VEH)
    # equal thrusts: pure lift, zero torques
    w = A @ np.full(4, h)
    np.testing.assert_allclose(w[0], VEH.mass * VEH.gravity, rtol=1e-12)
    np.testing.assert_allclose(w[1:], 0.0, atol=1e-12)
    # allocation is invertible (full rotor authority)
    assert abs(np.linalg.det(A)) > 1e-12
    # differential pairs create pure moments
    dw = A @ np.asarray([1.0, 1.0, -1.0, -1.0])
    assert dw[0] == 0.0 and abs(dw[3]) > 0  # yaw pair


def test_hover_equilibrium():
    x = x13([0.0, 0.0, 1.0])
    u = jnp.full(4, hover_thrust(VEH))
    ds = thrust_dynamics(x, u, veh=VEH)
    np.testing.assert_allclose(np.asarray(ds), 0.0, atol=1e-12)


def test_dynamics_jacobian_vs_fd(rng):
    x = x13([0.5, -0.2, 1.0]).at[3:6].set(jnp.asarray([0.3, -0.1, 0.2]))
    x = x.at[10:13].set(jnp.asarray([0.4, -0.5, 0.2]))
    u = jnp.full(4, hover_thrust(VEH)) + jnp.asarray(rng.standard_normal(4) * 0.3)
    phi = make_discrete_dynamics(lambda xx, uu: thrust_dynamics(xx, uu, veh=VEH), 0.1)
    A = jax.jacfwd(lambda xx: phi(xx, u))(x)
    eps = 1e-6
    for j in [0, 4, 7, 11]:
        dx = jnp.zeros(13).at[j].set(eps)
        col = (phi(x + dx, u) - phi(x - dx, u)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(A[:, j]), np.asarray(col), atol=1e-7)


def test_thrust_controller_hover_recovery():
    ctl = make_thrust_rti_controller(OCP, VEH)
    N = OCP.N_node
    xr = jnp.tile(x13([0.0, 0.0, 1.0]), (N + 1, 1))
    ur = jnp.tile(jnp.full(4, hover_thrust(VEH), jnp.float64), (N, 1))
    st = ctl.reset(xr, ur)
    plant = make_discrete_dynamics(
        lambda xx, uu: thrust_dynamics(xx, uu, veh=VEH), OCP.ts_nmpc, 4
    )
    x = x13([1.0, -0.5, 0.4])
    upd = jax.jit(ctl.update)
    f_lo, f_hi = rotor_thrust_bounds(VEH)
    for _ in range(250):
        u0, st, info = upd(st, x, xr, ur)
        assert float(u0.min()) >= f_lo - 1e-6 and float(u0.max()) <= f_hi + 1e-6
        x = plant(x, u0)
    assert bool(info.ok)
    err = float(jnp.linalg.norm(x[0:3] - jnp.asarray([0.0, 0.0, 1.0])))
    assert err < 0.02, err
    # body rates settle
    assert float(jnp.max(jnp.abs(x[10:13]))) < 0.05


def test_thrust_controller_tracks_trajectory():
    t = np.linspace(0, 2 * np.pi, 6)
    wpts = np.stack([np.sin(t), 0.5 * np.sin(2 * t), 1.0 + 0.1 * np.sin(t)], -1)
    traj = fit_waypoints(wpts, np.full(5, 2.5))

    ctl = make_thrust_rti_controller(OCP, VEH)
    plant = make_discrete_dynamics(
        lambda xx, uu: thrust_dynamics(xx, uu, veh=VEH), OCP.ts_nmpc, 4
    )
    xr10_0, ur4_0 = nmpc_refs(traj, jnp.asarray(0.0), OCP, VEH)
    xr0, ur0 = thrust_refs_from_bodyrate(xr10_0, ur4_0, VEH)
    st = ctl.reset(xr0, ur0)
    x = xr0[0]
    upd = jax.jit(ctl.update)

    @jax.jit
    def refs_at(tt):
        xr10, ur4 = nmpc_refs(traj, tt, OCP, VEH)
        return thrust_refs_from_bodyrate(xr10, ur4, VEH)

    err2 = 0.0
    n = 400
    for k in range(n):
        tt = jnp.asarray(k * OCP.ts_nmpc)
        xr, ur = refs_at(tt)
        u0, st, info = upd(st, x, xr, ur)
        x = plant(x, u0)
        from ndp_nmpc_qd_tpu.traj.polyopt import eval_traj

        fo = eval_traj(traj, tt)
        err2 += float(jnp.sum((x[0:3] - fo.pos) ** 2))
    rmse = np.sqrt(err2 / n)
    assert bool(info.ok)
    assert rmse < 0.05, rmse


def test_thrust_episode_mission():
    """The thrust controller reached from a MISSION (VERDICT r2 item 7):
    hold-then-track closed loop over the per-rotor plant, scanned."""
    from ndp_nmpc_qd_tpu.sim.thrust_loop import make_thrust_episode

    t = np.linspace(0, 2 * np.pi, 6)
    wpts = np.stack([np.sin(t), 0.5 * np.sin(2 * t), 1.0 + 0.1 * np.sin(t)], -1)
    traj = fit_waypoints(wpts, np.full(5, 2.5))
    init_fn, _, run_fn = make_thrust_episode(CFG, traj, hold_ticks=50)
    st = init_fn(dtype=jnp.float64)
    st, m, _ = jax.jit(lambda s: run_fn(s, 550))(st)
    assert bool(m.ok[0])
    assert float(m.pos_rmse[0]) < 0.06, float(m.pos_rmse[0])


def test_cli_thrust_mission(capsys):
    """`mission one_qd --controller thrust` end to end (CLI artifact)."""
    import json

    from ndp_nmpc_qd_tpu.cli import main

    main(
        [
            "mission", "one_qd", "--controller", "thrust", "--cpu",
            "--track-secs", "4", "--hold-ticks", "30",
            "--scenario", "hover_step",
        ]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] == [True]
    assert out["pos_rmse"][0] < 0.1
