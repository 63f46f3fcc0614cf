"""Riccati-IPM QP solver golden tests vs the independent dense SLSQP path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndp_nmpc_qd_tpu.models.quadrotor import hover_input, hover_state
from ndp_nmpc_qd_tpu.params import OcpParams, VehicleParams
from ndp_nmpc_qd_tpu.solver.ocp import make_ocp_functions
from ndp_nmpc_qd_tpu.solver.qp_ipm import solve_qp

from helpers_dense_qp import solve_dense

# fast tier (VERDICT r4 item 7): this whole file is in the <5 min smoke set
pytestmark = pytest.mark.smoke

OCP = OcpParams()
VEH = VehicleParams()


def make_qp(x0_offset, rng, active_bounds=False):
    """Build QP data by linearizing at a hover reference with a perturbed x0."""
    linearize_horizon, _ = make_ocp_functions(OCP, VEH, with_disturbance=False)
    N = OCP.N_node

    pos = jnp.asarray([0.0, 0.0, 1.0])
    xr = jnp.tile(hover_state(pos), (N + 1, 1))
    ur = jnp.tile(hover_input(VEH, dtype=jnp.float64), (N, 1))
    if active_bounds:
        # drive hard against the omega/velocity boxes: far-away setpoint
        xr = xr.at[:, 0].add(30.0)
        xr = xr.at[:, 1].add(-25.0)

    x_bar, u_bar = xr, ur
    qp = linearize_horizon(x_bar, u_bar, xr, ur)
    dx0 = jnp.asarray(x0_offset)
    return qp, dx0


@pytest.mark.parametrize("active", [False, True])
def test_ipm_matches_dense_reference(active, rng):
    x0_off = np.zeros(10)
    x0_off[:6] = rng.standard_normal(6) * (2.0 if active else 0.3)
    x0_off[6:10] = rng.standard_normal(4) * 0.05

    qp, dx0 = make_qp(x0_off, rng, active_bounds=active)
    sol = solve_qp(qp, dx0, num_iters=30)
    dx_ref, du_ref = solve_dense(qp, np.asarray(dx0))

    assert float(sol.eq_res) < 1e-8
    np.testing.assert_allclose(np.asarray(sol.du), du_ref, atol=2e-6)
    np.testing.assert_allclose(np.asarray(sol.dx), dx_ref, atol=2e-6)


def test_ipm_respects_bounds(rng):
    x0_off = np.zeros(10)
    x0_off[0:3] = [5.0, -5.0, 3.0]  # large position error -> saturation
    qp, dx0 = make_qp(x0_off, rng, active_bounds=True)
    sol = solve_qp(qp, dx0, num_iters=30)
    du = np.asarray(sol.du)
    lu, uu = np.asarray(qp.lu), np.asarray(qp.uu)
    assert np.all(du >= lu - 1e-7) and np.all(du <= uu + 1e-7)
    # check at least one bound is actually active in this scenario
    assert np.any(np.minimum(du - lu, uu - du) < 1e-5)


def test_ipm_batch_vmaps(rng):
    """vmap over scenarios must equal per-scenario solves."""
    qps, dx0s = [], []
    for k in range(4):
        x0_off = np.zeros(10)
        x0_off[:6] = rng.standard_normal(6) * 0.5
        qp, dx0 = make_qp(x0_off, rng)
        qps.append(qp)
        dx0s.append(dx0)
    qp_b = jax.tree.map(lambda *xs: jnp.stack(xs), *qps)
    dx0_b = jnp.stack(dx0s)
    sol_b = jax.vmap(lambda q, d: solve_qp(q, d, num_iters=20))(qp_b, dx0_b)
    for k in range(4):
        sol_k = solve_qp(qps[k], dx0s[k], num_iters=20)
        np.testing.assert_allclose(
            np.asarray(sol_b.du[k]), np.asarray(sol_k.du), atol=1e-9
        )
