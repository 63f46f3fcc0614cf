"""Structure-sparse OCP linearization for the fused Pallas IPM path.

The dense packed path (`ocp_packed.py`) stores every stage matrix in full:
Hxx (100 elements), A (100), B (40), Huu (16). But this OCP's structure pins
most of those elements to constants:

- The continuous dynamics (`models/quadrotor.py`) depend only on (v, q, u) —
  position never feeds back. Through the ERK chain the state sensitivity is
  EXACTLY block-triangular:

      A = d phi/dx = [[ I3, h*I3, Apq ],
                      [  0,   I3, Avq ],
                      [  0,    0, Aqq ]]        h = th_pred (exact: the
                                                p<-v tangent subsystem is
                                                linear, RK4 integrates it
                                                without error)

  so only Apq (3x4), Avq (3x4), Aqq (4x4) = 40 elements vary.
- d q_next / d c == 0 (collective accel never reaches the quaternion), so
  B = d phi/du needs Bp (3x4), Bv (3x4), Bq (4x3) = 36 elements. The six
  collective-thrust columns Bp[:, 3] / Bv[:, 3] are stored SEPARATELY
  (`bc`) so the optional bf16 curvature mode can keep exactly them in f32:
  the thrust channel's 0..27 m/s^2 scale amplifies absolute rounding error,
  and measured full-mission control deviation is 4.9e-3 with them in bf16
  vs 3.6e-4 with only `bc` held f32 (inside the 1e-3 golden bound).
- The Gauss-Newton Hessian (diagonal W, residual = [pos, vel, quat-err, u],
  `nmpc_body_rate_ctl.py:164-181`) is diag(q_diag[:6]) on pos/vel — a global
  constant — plus a dense 4x4 quaternion block Hq = Gq^T diag(wq) Gq; only
  Hq (16) varies. Huu is the constant diagonal stage_scale*r_diag (0 stored).

Net stage payload: 40+36+16 = 92 varying elements vs 256 dense — the
bandwidth-bound Riccati kernels read ~2.5x less HBM, and the linearization
itself pushes 8 tangent columns through the ERK chain instead of 14.

Reference parity: same residuals/weights/bounds as `ocp.make_ocp_functions`
(acados OCP at `nmpc_ctl/nmpc_body_rate_ctl.py:36-80`); `tests/test_sparse_path.py`
checks the sparse blocks reconstruct the dense jacfwd linearization.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.quadrotor import NU, NX, body_rate_dynamics
from ..ops import quat
from ..ops.integrators import make_discrete_dynamics
from ..ops.pallas.riccati import BLOCK
from ..params import OcpParams, VehicleParams
from .ocp import BIG
from .ocp_packed import _to_blocks


class SparseQp(NamedTuple):
    """Varying QP data in kernel layout; tail dims (nb, SUB, 128).

    Constant parts (diag6, r_diag, h, stage scaling) live in
    `SparseQpConsts` and are baked into the kernels as compile-time scalars.
    """

    hq: jnp.ndarray  # (N+1, 16)  4x4 quaternion Hessian block, row-major
    gx: jnp.ndarray  # (N+1, 10)
    gu: jnp.ndarray  # (N, 4)
    a: jnp.ndarray  # (N, 40)  [Apq(12), Avq(12), Aqq(16)] row-major blocks
    b: jnp.ndarray  # (N, 30)  omega columns [Bp(9), Bv(9), Bq(12)] row-major
    bc: jnp.ndarray  # (N, 6)  collective columns [Bp[:,3](3), Bv[:,3](3)];
    #                  ALWAYS compute dtype (see module docstring)
    r: jnp.ndarray  # (N, 10)
    lu: jnp.ndarray  # (N, 4)
    uu: jnp.ndarray  # (N, 4)
    lx: jnp.ndarray  # (N+1, 3)
    ux: jnp.ndarray  # (N+1, 3)


class SparseQpConsts(NamedTuple):
    """Compile-time scalars for the kernels (plain Python floats)."""

    h: float  # th_pred — the exact p<-v sensitivity
    diag6_stage: tuple  # stage_scale * q_diag[:6]
    diag6_term: tuple  # q_diag[:6] (terminal: acados cost_scaling[-1] = 1)
    rdiag_stage: tuple  # stage_scale * r_diag


def a_dense_from_sparse(a40: jnp.ndarray, h: float) -> jnp.ndarray:
    """(..., 40) sparse stage A -> (..., 10, 10) dense (for tests/fallback)."""
    batch = a40.shape[:-1]
    dt = a40.dtype
    apq = a40[..., 0:12].reshape(batch + (3, 4))
    avq = a40[..., 12:24].reshape(batch + (3, 4))
    aqq = a40[..., 24:40].reshape(batch + (4, 4))
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dt), batch + (3, 3))
    z33 = jnp.zeros(batch + (3, 3), dt)
    z43 = jnp.zeros(batch + (4, 3), dt)
    top = jnp.concatenate([eye3, h * eye3, apq], axis=-1)
    mid = jnp.concatenate([z33, eye3, avq], axis=-1)
    bot = jnp.concatenate([z43, z43, aqq], axis=-1)
    return jnp.concatenate([top, mid, bot], axis=-2)


def b_dense_from_sparse(b30: jnp.ndarray, bc6: jnp.ndarray) -> jnp.ndarray:
    """(..., 30) omega columns + (..., 6) collective columns
    -> (..., 10, 4) dense."""
    batch = b30.shape[:-1]
    dt = bc6.dtype
    b30 = b30.astype(dt)
    bp = jnp.concatenate(
        [b30[..., 0:9].reshape(batch + (3, 3)), bc6[..., 0:3, None]], axis=-1
    )
    bv = jnp.concatenate(
        [b30[..., 9:18].reshape(batch + (3, 3)), bc6[..., 3:6, None]], axis=-1
    )
    bq = b30[..., 18:30].reshape(batch + (4, 3))
    bq_full = jnp.concatenate([bq, jnp.zeros(batch + (4, 1), dt)], axis=-1)
    return jnp.concatenate([bp, bv, bq_full], axis=-2)


def make_linearizer_pallas(
    ocp: OcpParams, vehicle: VehicleParams, with_disturbance: bool,
    jac_dtype=None, interpret: bool = False,
):
    """Fused-kernel drop-in for `make_ocp_functions_sparse`.

    Same contract — returns (linearize_sparse, consts, phi) with batch-first
    (B, ...) inputs — but the stage QP data is computed by ONE Pallas kernel
    pass (`ops/pallas/linearize.py`): RK4 + tangent columns + GN cost terms +
    bounds, emitted directly in kernel layout. Parity vs the jnp path is
    element-level (`tests/test_lin_kernel.py`).
    """
    from ..ops.pallas.linearize import linearize_stage_data
    from ..ops.pallas.riccati import pack

    dt_h = ocp.th_pred
    stage_scale = dt_h if ocp.scale_stage_cost_by_dt else 1.0
    q_diag_np = np.asarray(ocp.q_diag())
    r_diag_np = np.asarray(ocp.r_diag())
    consts = SparseQpConsts(
        h=float(dt_h),
        diag6_stage=tuple(float(v) * stage_scale for v in q_diag_np[:6]),
        diag6_term=tuple(float(v) for v in q_diag_np[:6]),
        rdiag_stage=tuple(float(v) * stage_scale for v in r_diag_np),
    )

    def f(x, u, fd):
        return body_rate_dynamics(
            x, u, fd if with_disturbance else None,
            mass=vehicle.mass, gravity=vehicle.gravity,
        )

    phi = make_discrete_dynamics(f, dt_h, ocp.erk_substeps)

    kernel_consts = dict(
        h=float(dt_h), substeps=int(ocp.erk_substeps),
        mass=float(vehicle.mass), gravity=float(vehicle.gravity),
        stage_scale=float(stage_scale),
        q_diag=tuple(float(v) for v in q_diag_np),
        r_diag=tuple(float(v) for v in r_diag_np),
        u_lo=tuple(float(v) for v in np.asarray(ocp.u_lower())),
        u_hi=tuple(float(v) for v in np.asarray(ocp.u_upper())),
        v_lo=tuple(float(v) for v in np.asarray(ocp.v_lower())),
        v_hi=tuple(float(v) for v in np.asarray(ocp.v_upper())),
        with_dist=bool(with_disturbance), big=float(BIG),
        jac_dtype=jac_dtype, interpret=interpret,
    )

    def linearize_sparse(x_bar, u_bar, xr, ur, f_dist, x0, packed_xu=False):
        """`packed_xu=True`: x_bar/u_bar arrive ALREADY in kernel layout
        ((s, d, nb, SUB, 128), the kernel-layout-resident RtiState mode) and
        skip their pack transpose; the per-tick inputs xr/ur/f_dist/x0 stay
        batch-first."""
        N = ocp.N_node
        if packed_xu:
            dtype = x_bar.dtype
            B = x_bar.shape[2] * BLOCK
            xb_p, ub_p = x_bar, u_bar
        else:
            dtype = x_bar.dtype
            B = x_bar.shape[0]
            xb_p = pack(x_bar.astype(dtype))
            ub_p = pack(u_bar.astype(dtype))
        assert B % BLOCK == 0, B
        if f_dist is None:
            f_dist = jnp.zeros((B, N + 1, 3), dtype)
        outs = linearize_stage_data(
            xb_p, ub_p,
            pack(xr.astype(dtype)), pack(ur.astype(dtype)),
            pack(f_dist.astype(dtype)), pack(x0.astype(dtype)[:, None]),
            **kernel_consts,
        )
        hq, gx, gu, a, b, bc, r, lu, uu, lx, ux, dx0_p = outs
        qp = SparseQp(
            hq=hq, gx=gx, gu=gu, a=a, b=b, bc=bc, r=r,
            lu=lu, uu=uu, lx=lx, ux=ux,
        )
        return qp, dx0_p

    return linearize_sparse, consts, phi


def make_whole_step(
    ocp: OcpParams, vehicle: VehicleParams, with_disturbance: bool,
    *, jac_dtype=None, interpret: bool = False, num_iters: int = 4,
    tau: float = 0.95, sigma: float = 0.1, mu_init: float = 1.0,
    s_min: float = 1e-3, mu_min: float = 1e-12,
):
    """The ONE-KERNEL control step (`ops/pallas/step_whole.py`):
    linearization + whole IPM + SQP axpy fused, all inputs/outputs in
    packed kernel layout. Returns step(xb, ub, xr_p, ur_p, fd_p, x0_p,
    warm: IpmWarm) -> (xb_new, ub_new, lu_lo, lu_up, lx_lo, lx_up,
    mu (tail), eq_res (tail)).

    IPM knob defaults match `qp_ipm_sparse.ipm_sparse`."""
    from ..ops.pallas.step_whole import control_step_whole

    dt_h = ocp.th_pred
    stage_scale = dt_h if ocp.scale_stage_cost_by_dt else 1.0
    q_diag_np = np.asarray(ocp.q_diag())
    r_diag_np = np.asarray(ocp.r_diag())
    consts = dict(
        h=float(dt_h), substeps=int(ocp.erk_substeps),
        mass=float(vehicle.mass), gravity=float(vehicle.gravity),
        stage_scale=float(stage_scale),
        q_diag=tuple(float(v) for v in q_diag_np),
        r_diag=tuple(float(v) for v in r_diag_np),
        u_lo=tuple(float(v) for v in np.asarray(ocp.u_lower())),
        u_hi=tuple(float(v) for v in np.asarray(ocp.u_upper())),
        v_lo=tuple(float(v) for v in np.asarray(ocp.v_lower())),
        v_hi=tuple(float(v) for v in np.asarray(ocp.v_upper())),
        with_dist=bool(with_disturbance), big=float(BIG),
        diag6_stage=tuple(float(v) * stage_scale for v in q_diag_np[:6]),
        diag6_term=tuple(float(v) for v in q_diag_np[:6]),
        rdiag_stage=tuple(float(v) * stage_scale for v in r_diag_np),
        tau=tau, sigma=sigma, mu_init=mu_init, s_min=s_min, mu_min=mu_min,
        num_iters=num_iters, jac_dtype=jac_dtype, interpret=interpret,
    )

    def step(xb, ub, xr_p, ur_p, fd_p, x0_p, warm):
        return control_step_whole(
            xb, ub, xr_p, ur_p, fd_p, x0_p,
            warm.lu_lo, warm.lu_up, warm.lx_lo, warm.lx_up, warm.mu,
            **consts,
        )

    return step


def make_ocp_functions_sparse(
    ocp: OcpParams, vehicle: VehicleParams, with_disturbance: bool,
    jac_dtype=None,
):
    """Returns (linearize_sparse, consts, phi).

    linearize_sparse(x_bar, u_bar, xr, ur, f_dist, x0) -> (SparseQp, dx0_p)
    with batch-first (B, ...) inputs, B a BLOCK multiple.

    `jac_dtype` (e.g. jnp.bfloat16) stores the curvature payloads hq/a/b
    in a narrower dtype — an inexact-Jacobian Gauss-Newton variant that
    cuts the bandwidth-bound IPM's HBM traffic ~45%. The collective-thrust
    sensitivity columns (`bc`) stay full precision ALWAYS: they are the
    measured source of the bf16 golden-bound violation (module docstring).
    Gradients (gx, gu) and defects (r) also stay full precision, so the
    RTI FIXED POINT is unchanged: the converged iterate satisfies the true
    KKT conditions; only the transient Newton directions are perturbed.
    Kernel arithmetic promotes back to f32 tile ops. Measured full-mission
    max control deviation (figure-eight, vs the f32 path): 3.6e-4.
    """
    dt_h = ocp.th_pred
    stage_scale = dt_h if ocp.scale_stage_cost_by_dt else 1.0

    def f(x, u, fd):
        return body_rate_dynamics(
            x, u, fd if with_disturbance else None,
            mass=vehicle.mass, gravity=vehicle.gravity,
        )

    phi = make_discrete_dynamics(f, dt_h, ocp.erk_substeps)

    q_diag_np = np.asarray(ocp.q_diag())
    r_diag_np = np.asarray(ocp.r_diag())
    consts = SparseQpConsts(
        h=float(dt_h),
        diag6_stage=tuple(float(v) * stage_scale for v in q_diag_np[:6]),
        diag6_term=tuple(float(v) for v in q_diag_np[:6]),
        rdiag_stage=tuple(float(v) * stage_scale for v in r_diag_np),
    )
    u_lo_np = np.asarray(ocp.u_lower())
    u_hi_np = np.asarray(ocp.u_upper())
    v_lo_np = np.asarray(ocp.v_lower())
    v_hi_np = np.asarray(ocp.v_upper())

    def _hq_gxq(q_ref, qe, wq):
        """Closed-form Hq = Gq^T diag(wq) Gq (16,) and Gq^T (wq*qe) (4,).

        A (4,3)@(3,4) matmul here vmaps batch-last into an XLA batched
        convolution costing ~600 us/step at B=4096 (measured via profiler,
        incl. its layout copies); the explicit 3-term sums are pure lane
        FMAs. Gq columns from `_gq` (`nmpc_body_rate_ctl.py:164-166`).
        """
        qw, qx, qy, qz = q_ref[0], q_ref[1], q_ref[2], q_ref[3]
        cols = (
            (-qx, -qy, -qz),
            (qw, qz, -qy),
            (-qz, qw, qx),
            (qy, -qx, qw),
        )
        w1, w2, w3 = wq[0], wq[1], wq[2]
        hq = jnp.stack(
            [
                w1 * cols[i][0] * cols[j][0]
                + w2 * cols[i][1] * cols[j][1]
                + w3 * cols[i][2] * cols[j][2]
                for i in range(4)
                for j in range(4)
            ]
        )
        v0, v1, v2 = w1 * qe[0], w2 * qe[1], w3 * qe[2]
        gxq = jnp.stack(
            [
                cols[i][0] * v0 + cols[i][1] * v1 + cols[i][2] * v2
                for i in range(4)
            ]
        )
        return hq, gxq

    def stage_terms(xb, ub, xr_i, ur_i, fd_i):
        """Unbatched per-stage terms (vmapped stage-first, batch-last)."""
        dtype = xb.dtype
        q_diag = jnp.asarray(q_diag_np, dtype)
        r_diag = jnp.asarray(r_diag_np, dtype)
        wq = q_diag[7:10]

        q_ref = xr_i[6:10]
        qe = quat.error_vector(xb[6:10], q_ref)
        hq16, gxq = _hq_gxq(q_ref, qe, wq)
        hq = stage_scale * hq16
        gx = jnp.concatenate(
            [stage_scale * q_diag[:6] * (xb[0:6] - xr_i[0:6]),
             stage_scale * gxq]
        )
        gu = stage_scale * r_diag * (ub - ur_i)

        # ERK sensitivities: only the q-columns of d phi/dx vary (see module
        # docstring); 4 + 4 tangent columns instead of 14
        x_next = phi(xb, ub, fd_i)
        Aq = jax.jacfwd(
            lambda qq: phi(jnp.concatenate([xb[0:6], qq]), ub, fd_i)
        )(xb[6:10])  # (10, 4)
        Bm = jax.jacfwd(lambda uu: phi(xb, uu, fd_i))(ub)  # (10, 4)

        a40 = jnp.concatenate(
            [Aq[0:3].reshape(-1), Aq[3:6].reshape(-1), Aq[6:10].reshape(-1)]
        )
        b30 = jnp.concatenate(
            [
                Bm[0:3, 0:3].reshape(-1),
                Bm[3:6, 0:3].reshape(-1),
                Bm[6:10, 0:3].reshape(-1),
            ]
        )
        bc6 = jnp.concatenate([Bm[0:3, 3], Bm[3:6, 3]])
        return hq, gx, gu, a40, b30, bc6, x_next

    def terminal_terms(xb, xr_i):
        dtype = xb.dtype
        q_diag = jnp.asarray(q_diag_np, dtype)
        wq = q_diag[7:10]
        q_ref = xr_i[6:10]
        qe = quat.error_vector(xb[6:10], q_ref)
        hq, gxq = _hq_gxq(q_ref, qe, wq)
        gx = jnp.concatenate([q_diag[:6] * (xb[0:6] - xr_i[0:6]), gxq])
        return hq, gx

    stage_b = jax.vmap(stage_terms, in_axes=-1, out_axes=-1)
    stage_sb = jax.vmap(stage_b, in_axes=0, out_axes=0)
    term_b = jax.vmap(terminal_terms, in_axes=-1, out_axes=-1)

    def linearize_sparse(x_bar, u_bar, xr, ur, f_dist, x0):
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

        hq_s, gx_s, gu_s, a40, b30, bc6, x_next = stage_sb(
            xb[:N], ub, xr_t[:N], ur_t, fd[:N]
        )
        hqN, gxN = term_b(xb[N], xr_t[N])

        hq = jnp.concatenate([hq_s, hqN[None]], axis=0)
        gx = jnp.concatenate([gx_s, gxN[None]], axis=0)
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

        jd = jac_dtype or dtype
        qp = SparseQp(
            hq=_to_blocks(hq).astype(jd), gx=_to_blocks(gx),
            gu=_to_blocks(gu_s),
            a=_to_blocks(a40).astype(jd), b=_to_blocks(b30).astype(jd),
            bc=_to_blocks(bc6),
            r=_to_blocks(r),
            lu=_to_blocks(lu), uu=_to_blocks(uu),
            lx=_to_blocks(lx), ux=_to_blocks(ux),
        )
        dx0 = jnp.moveaxis(x0.astype(dtype), 0, -1) - xb[0]
        dx0_p = _to_blocks(dx0[None])
        return qp, dx0_p

    return linearize_sparse, consts, phi
