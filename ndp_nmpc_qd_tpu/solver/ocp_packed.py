"""Batch-last OCP linearization emitting packed QP data directly.

`ocp.make_ocp_functions` linearizes with the scenario batch LEADING — XLA
then lays the trailing 10/14-wide matrix dims on the 128 vector lanes and
wastes >90% of the VPU (measured ~6 ms of an 8.5 ms control step at
B = 2048). Here the batch rides the LAST axis end to end:

- inputs are transposed once ((B,s,d) -> (s,d,B), ~2 MB),
- `jax.vmap(..., in_axes=-1, out_axes=-1)` batches the per-stage math with
  B innermost, so every tangent/FMA is a full-width lane op,
- Gauss-Newton terms use the closed forms of this cost (diagonal W; the
  only dense block is the 3x4 quaternion-error Jacobian Gq), avoiding the
  14x14 J^T W J matmuls entirely,
- outputs reshape (no data movement) into the (stage, element, nb, SUB, 128)
  layout the Pallas Riccati kernels consume — the pack() transposes vanish.

Semantics identical to `ocp.linearize_horizon` (same residuals, ERK
sensitivities via jacfwd, acados cost scaling); `tests/test_ocp_packed.py`
checks element-level agreement.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.quadrotor import NU, NX, body_rate_dynamics
from ..ops import quat
from ..ops.integrators import make_discrete_dynamics
from ..ops.pallas.riccati import BLOCK
from ..params import OcpParams, VehicleParams
from .ocp import BIG


class PackedQp(NamedTuple):
    """QP data in kernel layout; nb = B_padded // 1024."""

    hxx: jnp.ndarray  # (N+1, 100, nb, SUB, 128)
    huu: jnp.ndarray  # (N, 16, ...)
    gx: jnp.ndarray  # (N+1, 10, ...)
    gu: jnp.ndarray  # (N, 4, ...)
    a: jnp.ndarray  # (N, 100, ...)
    b: jnp.ndarray  # (N, 40, ...)
    r: jnp.ndarray  # (N, 10, ...)
    lu: jnp.ndarray  # (N, 4, ...)
    uu: jnp.ndarray  # (N, 4, ...)
    lx: jnp.ndarray  # (N+1, 3, ...)
    ux: jnp.ndarray  # (N+1, 3, ...)


def _to_blocks(x: jnp.ndarray) -> jnp.ndarray:
    """(s, d, B) -> (s, d, nb, SUB, 128); B must be a BLOCK multiple."""
    s, d, B = x.shape
    return x.reshape(s, d, B // BLOCK, 8, 128)


def _gq(q_ref):
    """d qe / d q: the 3x4 Jacobian of the quaternion-error residual
    (`nmpc_body_rate_ctl.py:164-166`), rows [qe_x, qe_y, qe_z]."""
    qwr, qxr, qyr, qzr = q_ref[0], q_ref[1], q_ref[2], q_ref[3]
    return jnp.array(
        [
            [-qxr, qwr, -qzr, qyr],
            [-qyr, qzr, qwr, -qxr],
            [-qzr, -qyr, qxr, qwr],
        ]
    )


def make_ocp_functions_packed(
    ocp: OcpParams, vehicle: VehicleParams, with_disturbance: bool
):
    """Returns linearize_packed(x_bar, u_bar, xr, ur, f_dist, dx0) ->
    (PackedQp, dx0_packed). Inputs batch-first (B, ...); B padded to BLOCK
    by the caller (see qp_ipm_packed.solve_packed)."""
    dt = ocp.th_pred
    stage_scale = dt if ocp.scale_stage_cost_by_dt else 1.0

    def f(x, u, fd):
        return body_rate_dynamics(
            x, u, fd if with_disturbance else None,
            mass=vehicle.mass, gravity=vehicle.gravity,
        )

    phi = make_discrete_dynamics(f, dt, ocp.erk_substeps)

    import numpy as np

    q_diag_np = np.asarray(ocp.q_diag())
    r_diag_np = np.asarray(ocp.r_diag())
    u_lo_np = np.asarray(ocp.u_lower())
    u_hi_np = np.asarray(ocp.u_upper())
    v_lo_np = np.asarray(ocp.v_lower())
    v_hi_np = np.asarray(ocp.v_upper())

    def stage_terms(xb, ub, xr_i, ur_i, fd_i):
        """Unbatched per-stage terms; vmapped (stage, then batch-last)."""
        dtype = xb.dtype
        q_diag = jnp.asarray(q_diag_np, dtype)
        r_diag = jnp.asarray(r_diag_np, dtype)
        wq = q_diag[7:10]

        # --- Gauss-Newton cost terms in closed form ---
        q_ref = xr_i[6:10]
        Gq = _gq(q_ref).astype(dtype)  # (3, 4)
        # Hxx: diag on pos/vel + Gq^T diag(wq) Gq on the quaternion block
        Hq = Gq.T @ (wq[:, None] * Gq)  # (4, 4)
        Hxx = jnp.zeros((NX, NX), dtype)
        Hxx = Hxx.at[jnp.arange(6), jnp.arange(6)].set(q_diag[:6])
        Hxx = Hxx.at[6:10, 6:10].set(Hq)
        Hxx = stage_scale * Hxx
        Huu = stage_scale * jnp.diag(r_diag)

        # residual e = y - yref; qe is the shared bilinear error form
        qe = quat.error_vector(xb[6:10], q_ref)
        e_posvel = xb[0:6] - xr_i[0:6]
        gx = jnp.zeros((NX,), dtype)
        gx = gx.at[0:6].set(stage_scale * q_diag[:6] * e_posvel)
        gx = gx.at[6:10].set(stage_scale * (Gq.T @ (wq * qe)))
        gu = stage_scale * r_diag * (ub - ur_i)

        # --- ERK sensitivities ---
        x_next = phi(xb, ub, fd_i)
        A = jax.jacfwd(lambda xx: phi(xx, ub, fd_i))(xb)
        B = jax.jacfwd(lambda uu: phi(xb, uu, fd_i))(ub)
        return Hxx, Huu, gx, gu, x_next, A, B

    def terminal_terms(xb, xr_i):
        dtype = xb.dtype
        q_diag = jnp.asarray(q_diag_np, dtype)
        wq = q_diag[7:10]
        q_ref = xr_i[6:10]
        Gq = _gq(q_ref).astype(dtype)
        Hq = Gq.T @ (wq[:, None] * Gq)
        Hxx = jnp.zeros((NX, NX), dtype)
        Hxx = Hxx.at[jnp.arange(6), jnp.arange(6)].set(q_diag[:6])
        Hxx = Hxx.at[6:10, 6:10].set(Hq)
        qe = quat.error_vector(xb[6:10], q_ref)
        gx = jnp.zeros((NX,), dtype)
        gx = gx.at[0:6].set(q_diag[:6] * (xb[0:6] - xr_i[0:6]))
        gx = gx.at[6:10].set(Gq.T @ (wq * qe))
        return Hxx, gx

    # batch on the LAST axis, stages on the first
    stage_b = jax.vmap(stage_terms, in_axes=-1, out_axes=-1)
    stage_sb = jax.vmap(stage_b, in_axes=0, out_axes=0)
    term_b = jax.vmap(terminal_terms, in_axes=-1, out_axes=-1)

    def linearize_packed(x_bar, u_bar, xr, ur, f_dist, x0):
        """x_bar (B, N+1, nx) ... x0 (B, nx); B == k * BLOCK."""
        N = ocp.N_node
        dtype = x_bar.dtype
        B = x_bar.shape[0]
        assert B % BLOCK == 0, B

        xb = jnp.moveaxis(x_bar.astype(dtype), 0, -1)  # (N+1, nx, B)
        ub = jnp.moveaxis(u_bar.astype(dtype), 0, -1)
        xr_t = jnp.moveaxis(xr.astype(dtype), 0, -1)
        ur_t = jnp.moveaxis(ur.astype(dtype), 0, -1)
        if f_dist is None:
            fd = jnp.zeros((N + 1, 3, B), dtype)
        else:
            fd = jnp.moveaxis(f_dist.astype(dtype), 0, -1)

        Hxx_s, Huu_s, gx_s, gu_s, x_next, A, Bm = stage_sb(
            xb[:N], ub, xr_t[:N], ur_t, fd[:N]
        )
        HxxN, gxN = term_b(xb[N], xr_t[N])

        hxx = jnp.concatenate(
            [Hxx_s.reshape(N, NX * NX, B), HxxN.reshape(1, NX * NX, B)], axis=0
        )
        gx = jnp.concatenate([gx_s, gxN[None]], axis=0)  # (N+1, nx, B)
        r = x_next - xb[1:]

        u_lo = jnp.asarray(u_lo_np, dtype)[:, None]
        u_hi = jnp.asarray(u_hi_np, dtype)[:, None]
        v_lo = jnp.asarray(v_lo_np, dtype)[:, None]
        v_hi = jnp.asarray(v_hi_np, dtype)[:, None]
        lu = u_lo - ub
        uu = u_hi - ub
        vbar = xb[:, 3:6]
        lx = v_lo - vbar
        ux = v_hi - vbar
        mask = jnp.zeros((N + 1, 1, 1), bool).at[1:N].set(True)
        lx = jnp.where(mask, lx, -BIG)
        ux = jnp.where(mask, ux, BIG)

        qp = PackedQp(
            hxx=_to_blocks(hxx),
            huu=_to_blocks(Huu_s.reshape(N, NU * NU, B)),
            gx=_to_blocks(gx),
            gu=_to_blocks(gu_s),
            a=_to_blocks(A.reshape(N, NX * NX, B)),
            b=_to_blocks(Bm.reshape(N, NX * NU, B)),
            r=_to_blocks(r),
            lu=_to_blocks(lu),
            uu=_to_blocks(uu),
            lx=_to_blocks(lx),
            ux=_to_blocks(ux),
        )
        dx0 = jnp.moveaxis(x0.astype(dtype), 0, -1) - xb[0]  # (nx, B)
        dx0_p = _to_blocks(dx0[None])
        return qp, dx0_p

    return linearize_packed, phi
