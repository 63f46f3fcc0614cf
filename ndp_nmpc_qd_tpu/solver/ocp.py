"""OCP definition: residuals, Gauss-Newton cost terms, horizon linearization.

Reproduces the acados NONLINEAR_LS optimal control problem built at
`nmpc_ctl/nmpc_body_rate_ctl.py:36-80` (and its NDP variant with a per-stage
disturbance-force parameter, `ndp_nmpc_ctl/ndp_nmpc_body_rate_ctl.py:151-162`):

  min  sum_{i=0}^{N-1} s_i/2 ||y(x_i,u_i,p_i) - yref_i||_W^2
         + 1/2 ||y_e(x_N,p_N) - yref_N||_Q^2
  s.t. x_{i+1} = Phi_ERK(x_i, u_i, f_i),   x_0 fixed,
       lbu <= u_i <= ubu                  (i = 0..N-1)
       lbv <= v_i <= ubv                  (i = 1..N-1, velocity components)

with y = [pos, vel, qwr, qe+qr_vec, u] (the nonlinear quaternion tracking
residual of `nmpc_body_rate_ctl.py:164-179`), W = blkdiag(Q, R), and the acados
cost-scaling convention s_i = T/N for intermediate stages, 1 for the terminal.

Everything here is a pure function of arrays — `jax.vmap` over the stage axis
gives the horizon, another vmap gives the scenario batch, and `jax.jit` fuses
the whole linearization into one XLA computation (no per-stage host calls like
the reference's N+1 ctypes setters, `nmpc_body_rate_ctl.py:95-105`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.quadrotor import NU, NX, body_rate_dynamics
from ..ops import quat
from ..ops.integrators import make_discrete_dynamics
from ..params import OcpParams, VehicleParams

NY = NX + NU  # stage residual dim (14)


class QpData(NamedTuple):
    """Stage-wise QP data for one scenario (leading axis = stage)."""

    Hxx: jnp.ndarray  # (N+1, nx, nx)
    Hxu: jnp.ndarray  # (N, nx, nu)
    Huu: jnp.ndarray  # (N, nu, nu)
    gx: jnp.ndarray  # (N+1, nx)
    gu: jnp.ndarray  # (N, nu)
    A: jnp.ndarray  # (N, nx, nx)
    B: jnp.ndarray  # (N, nx, nu)
    r: jnp.ndarray  # (N, nx) linearization defect Phi(xb,ub) - xb_next
    lu: jnp.ndarray  # (N, nu) lower bound on du
    uu: jnp.ndarray  # (N, nu) upper bound on du
    lx: jnp.ndarray  # (N+1, n_bx) lower bound on bounded dx components
    ux: jnp.ndarray  # (N+1, n_bx) upper bound on bounded dx components


# Indices of state components with box bounds (vx, vy, vz) —
# `nmpc_body_rate_ctl.py:59-61` (idxbx = [3, 4, 5]).
BX_IDX = jnp.array([3, 4, 5])
N_BX = 3
BIG = 1e9  # stand-in for +/- inf on masked bounds (stage 0 and N state bounds)


def stage_output(x: jnp.ndarray, u: jnp.ndarray, q_ref: jnp.ndarray) -> jnp.ndarray:
    """acados cost_y_expr: [pos, vel, qwr, qe+qr_vec, u] (14,).

    Reference: `nmpc_body_rate_ctl.py:168-181`.
    """
    qe = quat.error_vector(x[..., 6:10], q_ref)
    state_y = jnp.concatenate(
        [x[..., 0:6], q_ref[..., 0:1], qe + q_ref[..., 1:4]], axis=-1
    )
    return jnp.concatenate([state_y, u], axis=-1)


def terminal_output(x: jnp.ndarray, q_ref: jnp.ndarray) -> jnp.ndarray:
    """acados cost_y_expr_e: the state part only (10,)."""
    qe = quat.error_vector(x[..., 6:10], q_ref)
    return jnp.concatenate(
        [x[..., 0:6], q_ref[..., 0:1], qe + q_ref[..., 1:4]], axis=-1
    )


def make_ocp_functions(ocp: OcpParams, vehicle: VehicleParams, with_disturbance: bool):
    """Build the linearize-whole-horizon function for this OCP.

    Returns `linearize_horizon(x_bar, u_bar, xr, ur, f_dist) -> QpData`, pure
    and vmappable over a scenario batch.
    """
    dt = ocp.th_pred

    def f(x, u, fd):
        return body_rate_dynamics(
            x, u, fd if with_disturbance else None,
            mass=vehicle.mass, gravity=vehicle.gravity,
        )

    phi = make_discrete_dynamics(f, dt, ocp.erk_substeps)

    w_diag_np = jnp.concatenate(
        [jnp.asarray(ocp.q_diag()), jnp.asarray(ocp.r_diag())]
    )  # (14,)
    q_diag_np = jnp.asarray(ocp.q_diag())  # (10,)
    stage_scale = dt if ocp.scale_stage_cost_by_dt else 1.0

    def linearize_horizon(x_bar, u_bar, xr, ur, f_dist=None):
        """x_bar (N+1,nx), u_bar (N,nu), xr (N+1,nx), ur (N,nu),
        f_dist (N+1,3) or None -> QpData. All outputs take x_bar's dtype
        (f32 on TPU, f64 in golden tests) — constants are cast, never
        promoted."""
        N = ocp.N_node
        dtype = x_bar.dtype
        if f_dist is None:
            f_dist = jnp.zeros((N + 1, 3), dtype)
        else:
            f_dist = f_dist.astype(dtype)
        x_bar = x_bar.astype(dtype)
        u_bar = u_bar.astype(dtype)
        xr = xr.astype(dtype)
        ur = ur.astype(dtype)

        w_diag = w_diag_np.astype(dtype)
        q_diag = q_diag_np.astype(dtype)
        u_lo = jnp.asarray(ocp.u_lower()).astype(dtype)
        u_hi = jnp.asarray(ocp.u_upper()).astype(dtype)
        v_lo = jnp.asarray(ocp.v_lower()).astype(dtype)
        v_hi = jnp.asarray(ocp.v_upper()).astype(dtype)

        def stage_terms(xb, ub, xr_i, ur_i, fd_i):
            """Linearize dynamics + GN cost for one intermediate stage."""
            q_ref = xr_i[6:10]
            yref = jnp.concatenate([xr_i, ur_i])

            def resid(z):
                return stage_output(z[:NX], z[NX:], q_ref) - yref

            z = jnp.concatenate([xb, ub])
            e = resid(z)
            J = jax.jacfwd(resid)(z)  # (14, 14)
            We = w_diag * e
            WJ = w_diag[:, None] * J
            # full f32 precision: the GN Hessian feeds a 20-stage recursion
            # where the MXU's default bf16 passes visibly degrade controls
            H = stage_scale * jnp.matmul(
                J.T, WJ, precision=jax.lax.Precision.HIGHEST
            )
            g = stage_scale * (J.T @ We)

            x_next = phi(xb, ub, fd_i)
            A = jax.jacfwd(lambda xx: phi(xx, ub, fd_i))(xb)
            B = jax.jacfwd(lambda uu: phi(xb, uu, fd_i))(ub)

            return (
                H[:NX, :NX], H[:NX, NX:], H[NX:, NX:],
                g[:NX], g[NX:], x_next, A, B,
            )

        Hxx_s, Hxu, Huu, gx_s, gu, x_next, A, B = jax.vmap(stage_terms)(
            x_bar[:N], u_bar, xr[:N], ur, f_dist[:N]
        )

        # terminal GN terms (W_e = Q, no dt scaling: acados cost_scaling[-1]=1)
        q_ref_N = xr[N, 6:10]
        yref_N = xr[N]

        def resid_N(xx):
            return terminal_output(xx, q_ref_N) - yref_N

        eN = resid_N(x_bar[N])
        JN = jax.jacfwd(resid_N)(x_bar[N])
        HN = jnp.matmul(
            JN.T, q_diag[:, None] * JN, precision=jax.lax.Precision.HIGHEST
        )
        gN = JN.T @ (q_diag * eN)

        Hxx = jnp.concatenate([Hxx_s, HN[None]], axis=0)
        gx = jnp.concatenate([gx_s, gN[None]], axis=0)

        r = x_next - x_bar[1:]  # multiple-shooting defect

        # bounds on deltas
        lu = u_lo[None, :] - u_bar
        uu = u_hi[None, :] - u_bar
        vbar = x_bar[:, 3:6]
        lx = v_lo[None, :] - vbar
        ux = v_hi[None, :] - vbar
        # acados box state bounds apply to nodes 1..N-1 only
        mask = jnp.zeros((N + 1, 1), dtype=bool).at[1:N].set(True)
        lx = jnp.where(mask, lx, -BIG)
        ux = jnp.where(mask, ux, BIG)

        return QpData(Hxx, Hxu, Huu, gx, gu, A, B, r, lu, uu, lx, ux)

    return linearize_horizon, phi
