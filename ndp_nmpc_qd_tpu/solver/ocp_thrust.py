"""Motor-thrust OCP: the controller the reference stubs but never built.

`nmpc_ctl/nmpc_motor_thrust_ctl.py:11-13` in the reference is an empty
placeholder. This module provides the working capability on top of the same
generic solver stack (`qp_ipm.solve_qp` is dimension-agnostic): a 13-state
full-attitude OCP whose inputs are the four rotor thrusts, with per-rotor
box bounds derived from the propeller model and the same nonlinear
quaternion-error cost extended by body-rate tracking.

  min sum s/2 ||[p-pr, v-vr, qe, w-wr, u-ur]||^2_W + terminal
  s.t. x+ = ERK4(x, u),  f_min <= u_i <= f_max,  |v| <= v_max.

Runs on the scan backend (the Pallas kernels are specialized to the 10/4
body-rate problem; generalizing them is ROADMAP work).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.quadrotor_thrust import (
    NUT,
    NXT,
    hover_thrust,
    rotor_thrust_bounds,
    thrust_dynamics,
)
from ..ops import quat
from ..ops.integrators import make_discrete_dynamics
from ..params import OcpParams, VehicleParams
from .ocp import BIG, QpData
from .qp_ipm import solve_qp
from .rti import RtiController, RtiInfo, RtiState


class ThrustOcpWeights(NamedTuple):
    """Extra weights beyond OcpParams: body-rate tracking and rotor effort."""

    Qw: float = 5.0  # body-rate tracking
    Ru: float = 2.0  # per-rotor thrust deviation


def make_thrust_ocp_functions(
    ocp: OcpParams, veh: VehicleParams, tw: ThrustOcpWeights = ThrustOcpWeights()
):
    dt = ocp.th_pred
    stage_scale = dt if ocp.scale_stage_cost_by_dt else 1.0

    def f(x, u, fd):
        return thrust_dynamics(x, u, fd, veh=veh)

    phi = make_discrete_dynamics(f, dt, ocp.erk_substeps)

    import numpy as np

    # state residual weights: [p(3), v(3), qw-slot, qe(3), w(3)]
    q_diag_np = np.concatenate([np.asarray(ocp.q_diag()), np.full(3, tw.Qw)])
    r_diag_np = np.full(4, tw.Ru)
    f_min, f_max = rotor_thrust_bounds(veh)
    u_lo_np = np.full(4, f_min)
    u_hi_np = np.full(4, f_max)
    v_lo_np = np.asarray(ocp.v_lower())
    v_hi_np = np.asarray(ocp.v_upper())

    def stage_output(x, u, q_ref):
        qe = quat.error_vector(x[..., 6:10], q_ref)
        return jnp.concatenate(
            [
                x[..., 0:6], q_ref[..., 0:1], qe + q_ref[..., 1:4],
                x[..., 10:13], u,
            ],
            axis=-1,
        )

    def linearize_horizon(x_bar, u_bar, xr, ur, f_dist=None):
        N = ocp.N_node
        dtype = x_bar.dtype
        if f_dist is None:
            f_dist = jnp.zeros((N + 1, 3), dtype)
        w_diag = jnp.asarray(np.concatenate([q_diag_np, r_diag_np]), dtype)
        q_diag = jnp.asarray(q_diag_np, dtype)

        def stage_terms(xb, ub, xr_i, ur_i, fd_i):
            q_ref = xr_i[6:10]
            yref = jnp.concatenate(
                [xr_i[0:10], xr_i[10:13], ur_i]
            )

            def resid(z):
                return stage_output(z[:NXT], z[NXT:], q_ref) - yref

            z = jnp.concatenate([xb, ub])
            e = resid(z)
            J = jax.jacfwd(resid)(z)
            H = stage_scale * jnp.matmul(
                J.T, w_diag[:, None] * J, precision=jax.lax.Precision.HIGHEST
            )
            g = stage_scale * (J.T @ (w_diag * e))
            x_next = phi(xb, ub, fd_i)
            A = jax.jacfwd(lambda xx: phi(xx, ub, fd_i))(xb)
            B = jax.jacfwd(lambda uu: phi(xb, uu, fd_i))(ub)
            return (
                H[:NXT, :NXT], H[:NXT, NXT:], H[NXT:, NXT:],
                g[:NXT], g[NXT:], x_next, A, B,
            )

        Hxx_s, Hxu, Huu, gx_s, gu, x_next, A, B = jax.vmap(stage_terms)(
            x_bar[:N], u_bar, xr[:N], ur, f_dist[:N]
        )

        q_ref_N = xr[N, 6:10]

        def resid_N(xx):
            return stage_output(xx, jnp.zeros((NUT,), dtype), q_ref_N)[
                : NXT
            ] - jnp.concatenate([xr[N, 0:10], xr[N, 10:13]])

        eN = resid_N(x_bar[N])
        JN = jax.jacfwd(resid_N)(x_bar[N])
        HN = jnp.matmul(
            JN.T, q_diag[:, None] * JN, precision=jax.lax.Precision.HIGHEST
        )
        gN = JN.T @ (q_diag * eN)

        Hxx = jnp.concatenate([Hxx_s, HN[None]], axis=0)
        gx = jnp.concatenate([gx_s, gN[None]], axis=0)
        r = x_next - x_bar[1:]

        lu = jnp.asarray(u_lo_np, dtype)[None, :] - u_bar
        uu = jnp.asarray(u_hi_np, dtype)[None, :] - u_bar
        vbar = x_bar[:, 3:6]
        lx = jnp.asarray(v_lo_np, dtype)[None, :] - vbar
        ux = jnp.asarray(v_hi_np, dtype)[None, :] - vbar
        mask = jnp.zeros((N + 1, 1), bool).at[1:N].set(True)
        lx = jnp.where(mask, lx, -BIG)
        ux = jnp.where(mask, ux, BIG)
        return QpData(Hxx, Hxu, Huu, gx, gu, A, B, r, lu, uu, lx, ux)

    return linearize_horizon, phi


def make_thrust_rti_controller(
    ocp: OcpParams,
    veh: VehicleParams,
    tw: ThrustOcpWeights = ThrustOcpWeights(),
    *,
    qp_iters: int = 12,
    eq_tol: float = 1e-3,
) -> RtiController:
    """SQP-RTI for the motor-thrust model (same contract as
    make_rti_controller; nx=13, nu=4 rotor thrusts)."""
    linearize_horizon, _phi = make_thrust_ocp_functions(ocp, veh, tw)
    f_min, f_max = rotor_thrust_bounds(veh)

    def reset(xr, ur):
        return RtiState(jnp.asarray(xr), jnp.asarray(ur))

    def update(state, x0, xr, ur, f_dist=None):
        qp = linearize_horizon(state.x_bar, state.u_bar, xr, ur, f_dist)
        dx0 = x0.astype(state.x_bar.dtype) - state.x_bar[0]
        sol = solve_qp(qp, dx0, num_iters=qp_iters)
        new_state = RtiState(state.x_bar + sol.dx, state.u_bar + sol.du)
        u0 = new_state.u_bar[0]
        tol = 1e-4 * (f_max - f_min)
        in_box = jnp.all(
            (new_state.u_bar >= f_min - tol) & (new_state.u_bar <= f_max + tol)
        )
        info = RtiInfo(
            mu=sol.mu,
            eq_res=sol.eq_res,
            ok=jnp.isfinite(sol.eq_res) & (sol.eq_res < eq_tol) & in_box,
        )
        return u0, new_state, info

    return RtiController(reset, update, ocp, veh, False)


def thrust_refs_from_bodyrate(xr10, ur4, veh: VehicleParams):
    """Lift body-rate references (from traj.refgen) to the 13-state model:
    state gains the flatness body rates, control becomes hover-split rotor
    thrusts of the commanded collective force.

    xr10 (..., N+1, 10), ur4 (..., N, 4 = [wx,wy,wz,c]) ->
    (xr13 (..., N+1, 13), ur (..., N, 4) rotor thrusts).
    """
    N = ur4.shape[-2]
    w_ref = jnp.concatenate(
        [ur4[..., :, 0:3], ur4[..., -1:, 0:3]], axis=-2
    )  # extend last control's rates to node N
    xr13 = jnp.concatenate([xr10, w_ref], axis=-1)
    f_total = ur4[..., :, 3] * veh.mass
    ur = jnp.repeat(f_total[..., None] / 4.0, 4, axis=-1)
    return xr13, ur
