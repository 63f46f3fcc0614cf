"""Far-regime robustness (VERDICT r1 item 2): single-step ok-envelope out to
100 m via the feasible zero-control fallback start, zero change in the
nominal regime, and closed-loop recovery with a bounded executed command."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndp_nmpc_qd_tpu.models.quadrotor import (
    body_rate_dynamics,
    hover_input,
    hover_state,
)
from ndp_nmpc_qd_tpu.ops.integrators import make_discrete_dynamics
from ndp_nmpc_qd_tpu.params import OcpParams, VehicleParams
from ndp_nmpc_qd_tpu.solver.rti import (
    make_batched_rti_controller,
    make_rti_controller,
)


def _setup(B, ds, qp_iters, backend="jax", **kw):
    ocp, veh = OcpParams(), VehicleParams()
    N = ocp.N_node
    ctl = make_batched_rti_controller(
        ocp, veh, with_disturbance=True, qp_iters=qp_iters, backend=backend,
        **kw,
    )
    x0 = hover_state(
        jnp.stack([jnp.asarray(ds), jnp.zeros(B), jnp.zeros(B)], axis=-1)
    )
    xr = jnp.tile(hover_state(jnp.zeros((B, 3)))[:, None, :], (1, N + 1, 1))
    ur = jnp.tile(
        hover_input(veh, (B,), jnp.float64)[:, None, :], (1, N, 1)
    )
    f = jnp.zeros((B, N + 1, 3))
    return ctl, x0, xr, ur, f, ocp


@pytest.mark.parametrize("qp_iters", [6, 8, 12])
def test_single_step_envelope_to_100m(qp_iters):
    """One RTI update from hover offsets 5..100 m: every scenario healthy
    (eq-res + both boxes), executed command inside the actuator box.
    HPIPM-class robustness (`nmpc_body_rate_ctl.py:71-72`); the round-1
    fixed-start IPM died at ~18 m."""
    ds = np.linspace(5.0, 100.0, 20)
    ctl, x0, xr, ur, f, ocp = _setup(len(ds), ds, qp_iters)
    st = ctl.reset(xr, ur)
    u0, st1, info = jax.jit(ctl.update)(st, x0, xr, ur, f)
    assert bool(jnp.all(info.ok)), np.asarray(info.ok)
    u_lo, u_hi = np.asarray(ocp.u_lower()), np.asarray(ocp.u_upper())
    assert np.all(np.asarray(u0) >= u_lo - 1e-9)
    assert np.all(np.asarray(u0) <= u_hi + 1e-9)
    # the far-regime command actually brakes toward the target (negative x
    # tilt -> negative pitch rate for +x offset... sign depends on frame;
    # just require a non-trivial command)
    assert float(jnp.abs(u0[-1, :3]).max()) > 0.1


def test_nominal_regime_bitwise_unchanged():
    """The fallback selection must not perturb nominal solves: for offsets
    where the clipped-LQR start is v-feasible the code path is identical, so
    the solution matches a tight-convergence solve to golden tolerance."""
    ds = np.array([0.3, 1.0, 2.0, 5.0])
    ctl12, x0, xr, ur, f, _ = _setup(len(ds), ds, 12)
    ctl40, *_ = _setup(len(ds), ds, 40)
    u12, _, i12 = jax.jit(ctl12.update)(ctl12.reset(xr, ur), x0, xr, ur, f)
    u40, _, i40 = jax.jit(ctl40.update)(ctl40.reset(xr, ur), x0, xr, ur, f)
    assert bool(jnp.all(i12.ok)) and bool(jnp.all(i40.ok))
    np.testing.assert_allclose(np.asarray(u12), np.asarray(u40), atol=1e-4)


def test_closed_loop_recovery_50m():
    """Closed loop from 50 m converges to the setpoint; transient not-ok
    flags are allowed (honest health), the executed command never leaves the
    actuator box."""
    ocp, veh = OcpParams(), VehicleParams()
    ctl = make_rti_controller(ocp, veh, qp_iters=8)
    tgt = jnp.asarray([0.0, 0.0, 1.0])
    xr = jnp.tile(hover_state(tgt)[None], (ocp.N_node + 1, 1))
    ur = jnp.tile(hover_input(veh, dtype=jnp.float64)[None], (ocp.N_node, 1))
    state = ctl.reset(xr, ur)
    plant = make_discrete_dynamics(
        lambda x, u: body_rate_dynamics(x, u, mass=veh.mass, gravity=veh.gravity),
        ocp.ts_nmpc,
        4,
    )
    x = hover_state(jnp.asarray([50.0, 0.0, 1.0]))
    upd = jax.jit(ctl.update)
    u_lo, u_hi = np.asarray(ocp.u_lower()), np.asarray(ocp.u_upper())
    for _ in range(500):
        u0, state, info = upd(state, x, xr, ur)
        assert np.all(np.asarray(u0) >= u_lo - 1e-9)
        assert np.all(np.asarray(u0) <= u_hi + 1e-9)
        x = plant(x, u0)
    assert float(jnp.linalg.norm(x[0:3] - tgt)) < 0.05


def test_mehrotra_matches_plain_nominal():
    """The Mehrotra predictor-corrector option converges to the same QP
    solution as the fixed-sigma loop in the nominal regime."""
    ds = np.array([0.5, 2.0, 8.0])
    ctl_p, x0, xr, ur, f, _ = _setup(len(ds), ds, 12)
    ctl_m, *_ = _setup(len(ds), ds, 12, mehrotra=True)
    up, _, ip = jax.jit(ctl_p.update)(ctl_p.reset(xr, ur), x0, xr, ur, f)
    um, _, im = jax.jit(ctl_m.update)(ctl_m.reset(xr, ur), x0, xr, ur, f)
    assert bool(jnp.all(ip.ok)) and bool(jnp.all(im.ok))
    np.testing.assert_allclose(np.asarray(um), np.asarray(up), atol=1e-3)


def test_sparse_backend_envelope_interpret():
    """The packed Pallas IPM (interpret mode) applies the same per-lane
    feasible fallback: far scenarios healthy, near scenarios bit-comparable
    to the scan backend."""
    ds = np.array([1.0, 30.0, 60.0, 100.0])
    ctl_s, x0, xr, ur, f, _ = _setup(
        len(ds), ds, 8, backend="pallas", interpret=True
    )
    ctl_j, *_ = _setup(len(ds), ds, 8, backend="jax")
    us, _, infs = jax.jit(ctl_s.update)(ctl_s.reset(xr, ur), x0, xr, ur, f)
    uj, _, infj = jax.jit(ctl_j.update)(ctl_j.reset(xr, ur), x0, xr, ur, f)
    assert bool(jnp.all(infs.ok)), np.asarray(infs.ok)
    assert bool(jnp.all(infj.ok))
    np.testing.assert_allclose(
        np.asarray(us[0]), np.asarray(uj[0]), atol=1e-6
    )
