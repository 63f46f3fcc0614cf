"""RTI fixed-point = true NLP optimum, validated from first principles.

Iterating `update` with frozen (x0, refs) drives SQP-RTI to a fixed point.
At a fixed point the QP's solution is zero, whose stationarity conditions
are exactly the KKT conditions of the discretized OCP (Gauss-Newton only
approximates the Hessian, never the gradient). We verify this with a fully
INDEPENDENT oracle: jax.grad of the single-shooting objective

    J(u) = sum_i s_i/2 ||y(x_i(u), u_i) - yref_i||_W^2 + terminal,
    x_{i+1}(u) = Phi_ERK(x_i(u), u_i),  x_0 fixed

which uses none of the solver's linearization/QP machinery. KKT:
  - inactive control components: dJ/du = 0
  - active upper bounds: dJ/du <= 0;  active lower bounds: dJ/du >= 0.

This is the strongest acados-parity evidence available without acados in
the environment: both solvers target the same NLP KKT points, and the QP
layer is separately matched to an independent dense solver (test_qp.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndp_nmpc_qd_tpu.models.quadrotor import body_rate_dynamics, hover_input, hover_state
from ndp_nmpc_qd_tpu.ops.integrators import make_discrete_dynamics
from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.solver.ocp import stage_output, terminal_output
from ndp_nmpc_qd_tpu.solver.rti import make_rti_controller

# fast tier (VERDICT r4 item 7): this whole file is in the <5 min smoke set
pytestmark = pytest.mark.smoke

CFG = NdpNmpcConfig()
OCP, VEH = CFG.ocp, CFG.vehicle


def shooting_objective(u_flat, x0, xr, ur):
    """Exact discretized OCP cost as a function of the controls only."""
    N = OCP.N_node
    u = u_flat.reshape(N, 4)
    phi = make_discrete_dynamics(
        lambda x, uu: body_rate_dynamics(x, uu, mass=VEH.mass, gravity=VEH.gravity),
        OCP.th_pred, OCP.erk_substeps,
    )
    w = jnp.concatenate([jnp.asarray(OCP.q_diag()), jnp.asarray(OCP.r_diag())])
    q_diag = jnp.asarray(OCP.q_diag())
    s = OCP.th_pred if OCP.scale_stage_cost_by_dt else 1.0

    def body(x, inp):
        u_i, xr_i, ur_i = inp
        e = stage_output(x, u_i, xr_i[6:10]) - jnp.concatenate([xr_i, ur_i])
        c = 0.5 * s * jnp.sum(w * e * e)
        return phi(x, u_i), c

    xN, cs = jax.lax.scan(body, x0, (u, xr[:N], ur))
    eN = terminal_output(xN, xr[N, 6:10]) - xr[N]
    return jnp.sum(cs) + 0.5 * jnp.sum(q_diag * eN * eN)


@pytest.mark.parametrize("offset", [0.3, 2.0])
def test_rti_fixed_point_satisfies_nlp_kkt(offset):
    ctl = make_rti_controller(OCP, VEH, qp_iters=30)
    N = OCP.N_node
    xr = jnp.tile(hover_state(jnp.asarray([0.0, 0.0, 1.0])), (N + 1, 1))
    ur = jnp.tile(hover_input(VEH, dtype=jnp.float64), (N, 1))
    x0 = hover_state(jnp.asarray([offset, -0.5 * offset, 1.0 + 0.2 * offset]))

    state = ctl.reset(xr, ur)
    upd = jax.jit(ctl.update)
    for _ in range(60):  # converge the RTI iterates (frozen problem)
        u0, state, info = upd(state, x0, xr, ur)
    assert bool(info.ok)

    u_star = state.u_bar
    # velocity (state) bounds must be inactive for the reduced-gradient test
    v = state.x_bar[1:N, 3:6]
    assert float(jnp.max(jnp.abs(v))) < OCP.v_max - 1e-3

    g = jax.grad(shooting_objective)(u_star.reshape(-1), x0, xr, ur).reshape(N, 4)
    g = np.asarray(g)
    u_np = np.asarray(u_star)
    lo = np.asarray(OCP.u_lower())
    hi = np.asarray(OCP.u_upper())
    tol_act = 1e-6

    at_hi = u_np >= hi - tol_act
    at_lo = u_np <= lo + tol_act
    inactive = ~(at_hi | at_lo)

    # scale: gradient magnitudes of the problem
    scale = max(1.0, np.abs(g).max())
    assert np.abs(g[inactive]).max() / scale < 5e-5, np.abs(g[inactive]).max()
    if at_hi.any():
        assert g[at_hi].max() < 1e-6 * scale  # pushes outward at upper bound
    if at_lo.any():
        assert g[at_lo].min() > -1e-6 * scale

    if offset >= 1.0:
        # the aggressive case must actually have active bounds to be a
        # meaningful constrained-KKT check
        assert at_hi.any() or at_lo.any()
