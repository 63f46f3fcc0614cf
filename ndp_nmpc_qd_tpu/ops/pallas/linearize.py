"""Fused Pallas linearization kernel: stage QP data straight from iterates.

Replaces the jnp `solver/ocp_sparse.linearize_sparse` on the production TPU
path. One kernel pass per control tick computes, per shooting stage and per
scenario lane:

- the RK4 discrete step x_next = Phi(x, u, f_dist) and its 8 varying tangent
  columns (4 quaternion state columns + 4 control columns — the only
  non-constant sensitivities, see `solver/ocp_sparse.py`'s structure proof),
  via `jax.linearize` of the tile-level dynamics inside the kernel (the
  primal RK4 chain is traced once; the 8 tangent replays share it),
- the Gauss-Newton cost terms: closed-form quaternion Hessian block
  Hq = Gq^T diag(wq) Gq and gradients (`nmpc_ctl/nmpc_body_rate_ctl.py:164-181`),
- defects r = Phi(x_k, u_k) - x_{k+1}, bound residuals, and the pinned-state
  residual dx0 = x0 - x_bar[0] (acados `solve_for_x0` semantics).

Everything is emitted directly in the sparse packed kernel layout consumed by
`riccati_sweep_sparse` — the intermediate (B, N, ...) tensors, layout
transposes, and concatenates of the jnp path never touch HBM. Batch rides the
(8, 128) tile exactly as in `riccati.py`; the stage axis rides the sequential
grid. All arithmetic is f32 VPU FMAs (`jac_dtype` optionally narrows the
stored curvature payloads, matching the opt-in bf16 mode of the jnp path).

Parity: `tests/test_lin_kernel.py` checks every SparseQp field against the
jnp `linearize_sparse` in interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .riccati import LANE, SUB, pack
from .riccati_sparse import _nbt_for, _pinned_spec, _stage_spec

NX = 10
NU = 4


def _f_cont(x, u, fd, *, mass, gravity):
    """Continuous dynamics on tuples of tiles (`models/quadrotor.py:26-60`).

    Tuple-of-tiles (not a stacked array) so every component stays a full
    (nbt, 8, 128) VPU tile and `jax.linearize` traces scalar-per-lane FMAs.
    """
    vx, vy, vz = x[3], x[4], x[5]
    qw, qx, qy, qz = x[6], x[7], x[8], x[9]
    wx, wy, wz, c = u
    ax = 2.0 * (qx * qz + qw * qy) * c
    ay = 2.0 * (qy * qz - qw * qx) * c
    az = (1.0 - 2.0 * qx * qx - 2.0 * qy * qy) * c - gravity
    if fd is not None:
        ax = ax + fd[0] * (1.0 / mass)
        ay = ay + fd[1] * (1.0 / mass)
        az = az + fd[2] * (1.0 / mass)
    dqw = (-wx * qx - wy * qy - wz * qz) * 0.5
    dqx = (wx * qw + wz * qy - wy * qz) * 0.5
    dqy = (wy * qw - wz * qx + wx * qz) * 0.5
    dqz = (wz * qw + wy * qx - wx * qy) * 0.5
    return (vx, vy, vz, ax, ay, az, dqw, dqx, dqy, dqz)


def _rk4(x, u, fd, *, h, substeps, mass, gravity):
    """Classic RK4 on tuples of tiles (`ops/integrators.py:20-35`)."""
    hh = h / substeps
    for _ in range(substeps):
        k1 = _f_cont(x, u, fd, mass=mass, gravity=gravity)
        x2 = tuple(x[i] + (0.5 * hh) * k1[i] for i in range(NX))
        k2 = _f_cont(x2, u, fd, mass=mass, gravity=gravity)
        x3 = tuple(x[i] + (0.5 * hh) * k2[i] for i in range(NX))
        k3 = _f_cont(x3, u, fd, mass=mass, gravity=gravity)
        x4 = tuple(x[i] + hh * k3[i] for i in range(NX))
        k4 = _f_cont(x4, u, fd, mass=mass, gravity=gravity)
        x = tuple(
            x[i] + (hh / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i])
            for i in range(NX)
        )
    return x


def _hq_gxq_tiles(q_ref, qe, wq):
    """Closed-form Hq (16 tiles) and Gq^T (wq*qe) (4 tiles).

    Same explicit 3-term lane FMAs as `ocp_sparse._hq_gxq` (a real matmul
    here lowers to a batched convolution — measured 10x slower).
    """
    qw, qx, qy, qz = q_ref
    cols = (
        (-qx, -qy, -qz),
        (qw, qz, -qy),
        (-qz, qw, qx),
        (qy, -qx, qw),
    )
    w1, w2, w3 = wq
    hq = [
        w1 * cols[i][0] * cols[j][0]
        + w2 * cols[i][1] * cols[j][1]
        + w3 * cols[i][2] * cols[j][2]
        for i in range(4)
        for j in range(4)
    ]
    v0, v1, v2 = w1 * qe[0], w2 * qe[1], w3 * qe[2]
    gxq = [cols[i][0] * v0 + cols[i][1] * v1 + cols[i][2] * v2 for i in range(4)]
    return hq, gxq


def _qe_tiles(q, q_ref):
    """Quaternion tracking error on tiles (`ops/quat.py:126-144`)."""
    qw, qx, qy, qz = q
    qwr, qxr, qyr, qzr = q_ref
    return (
        qwr * qx - qw * qxr + qyr * qz - qy * qzr,
        qwr * qy - qw * qyr - qxr * qz + qx * qzr,
        qxr * qy - qx * qyr + qwr * qz - qw * qzr,
    )


def _lin_stage_terms(
    x, x1, u, xr, ur, fd,
    *, h, substeps, mass, gravity, stage_scale, q_diag, r_diag,
):
    """One shooting stage's QP terms on tiles — shared by the standalone
    linearization kernel and the fused whole-step kernel
    (`ops/pallas/step_whole.py`).

    Returns (hq16, gx10, gu4, a40, b30, bc6, r10) as lists of tiles
    (compute dtype; callers cast curvature payloads to jac dtype).
    """
    wq = q_diag[7:10]
    q_ref = xr[6:10]
    qe = _qe_tiles(x[6:10], q_ref)
    hq16, gxq = _hq_gxq_tiles(q_ref, qe, wq)
    hq = [stage_scale * t for t in hq16]
    gx = [(stage_scale * q_diag[i]) * (x[i] - xr[i]) for i in range(6)]
    gx += [stage_scale * g for g in gxq]
    gu = [(stage_scale * r_diag[l]) * (u[l] - ur[l]) for l in range(NU)]

    # RK4 step + the 8 varying tangent columns
    phi_fn = functools.partial(
        _rk4, fd=fd, h=h, substeps=substeps, mass=mass, gravity=gravity
    )
    x_next, jvp = jax.linearize(lambda xt, ut: phi_fn(xt, ut), x, u)
    one = jnp.ones_like(x[0])
    zero = jnp.zeros_like(x[0])
    zx = (zero,) * NX
    zu = (zero,) * NU
    a_cols = [
        jvp(tuple(one if i == 6 + j else zero for i in range(NX)), zu)
        for j in range(4)
    ]
    b_cols = [
        jvp(zx, tuple(one if m == l else zero for m in range(NU)))
        for l in range(NU)
    ]
    a40 = [None] * 40
    for i in range(3):
        for j in range(4):
            a40[i * 4 + j] = a_cols[j][i]  # Apq
            a40[12 + i * 4 + j] = a_cols[j][3 + i]  # Avq
    for i in range(4):
        for j in range(4):
            a40[24 + i * 4 + j] = a_cols[j][6 + i]  # Aqq
    b30 = [None] * 30
    bc6 = [None] * 6
    for i in range(3):
        for l in range(3):
            b30[i * 3 + l] = b_cols[l][i]  # Bp omega cols
            b30[9 + i * 3 + l] = b_cols[l][3 + i]  # Bv omega
        # collective columns stay compute dtype (see ocp_sparse docstring)
        bc6[i] = b_cols[3][i]
        bc6[3 + i] = b_cols[3][3 + i]
    for i in range(4):
        for l in range(3):
            b30[18 + i * 3 + l] = b_cols[l][6 + i]  # Bq
    r = [x_next[i] - x1[i] for i in range(NX)]
    return hq, gx, gu, a40, b30, bc6, r


def _lin_terminal_terms(x1, xrT, *, q_diag):
    """Terminal-node GN terms (acados cost_scaling[-1] = 1)."""
    wq = q_diag[7:10]
    q_refT = xrT[6:10]
    qeT = _qe_tiles(x1[6:10], q_refT)
    hqT, gxqT = _hq_gxq_tiles(q_refT, qeT, wq)
    gxT = [q_diag[i] * (x1[i] - xrT[i]) for i in range(6)] + list(gxqT)
    return hqT, gxT


def _lin_kernel(
    xb_ref, xb1_ref, ub_ref, xr_ref, ur_ref, fd_ref, xrT_ref, x0_ref,
    hq_out, gx_out, gu_out, a_out, b_out, bc_out, r_out,
    lu_out, uu_out, lx_out, ux_out, hqT_out, gxT_out, dx0_out,
    *, h, substeps, mass, gravity, stage_scale, q_diag, r_diag,
    u_lo, u_hi, v_lo, v_hi, with_dist, n_stages,
):
    s = pl.program_id(1)
    x = tuple(xb_ref[0, i] for i in range(NX))
    x1 = tuple(xb1_ref[0, i] for i in range(NX))
    u = tuple(ub_ref[0, l] for l in range(NU))
    xr = tuple(xr_ref[0, i] for i in range(NX))
    ur = tuple(ur_ref[0, l] for l in range(NU))
    fd = tuple(fd_ref[0, t] for t in range(3)) if with_dist else None
    jd = hq_out.dtype

    hq, gx, gu, a40, b30, bc6, r = _lin_stage_terms(
        x, x1, u, xr, ur, fd,
        h=h, substeps=substeps, mass=mass, gravity=gravity,
        stage_scale=stage_scale, q_diag=q_diag, r_diag=r_diag,
    )
    for k in range(16):
        hq_out[0, k] = hq[k].astype(jd)
    for i in range(NX):
        gx_out[0, i] = gx[i]
    for l in range(NU):
        gu_out[0, l] = gu[l]
    for j in range(40):
        a_out[0, j] = a40[j].astype(jd)
    for j in range(30):
        b_out[0, j] = b30[j].astype(jd)
    for j in range(6):
        bc_out[0, j] = bc6[j]
    for i in range(NX):
        r_out[0, i] = r[i]

    # ---- bound residuals ----
    for l in range(NU):
        lu_out[0, l] = u_lo[l] - u[l]
        uu_out[0, l] = u_hi[l] - u[l]
    for t in range(3):
        lx_out[0, t] = v_lo[t] - x[3 + t]
        ux_out[0, t] = v_hi[t] - x[3 + t]

    # ---- pinned-state residual (stage 0) ----
    @pl.when(s == 0)
    def _():
        for i in range(NX):
            dx0_out[0, i] = x0_ref[0, i] - x[i]

    # ---- terminal cost terms (ride the last grid step; x1 == x_bar[N]) ----
    @pl.when(s == n_stages - 1)
    def _():
        xrT = tuple(xrT_ref[0, i] for i in range(NX))
        hqT, gxT = _lin_terminal_terms(x1, xrT, q_diag=q_diag)
        for k in range(16):
            hqT_out[0, k] = hqT[k].astype(jd)
        for i in range(NX):
            gxT_out[0, i] = gxT[i]


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "substeps", "mass", "gravity", "stage_scale", "q_diag",
        "r_diag", "u_lo", "u_hi", "v_lo", "v_hi", "with_dist", "big",
        "jac_dtype", "interpret",
    ),
)
def linearize_stage_data(
    xb, ub, xr, ur, fd, x0,
    *, h, substeps, mass, gravity, stage_scale, q_diag, r_diag,
    u_lo, u_hi, v_lo, v_hi, with_dist, big, jac_dtype=None,
    interpret: bool = False,
):
    """Packed-layout fused linearization.

    Inputs (tail = (nb, SUB, 128)): xb (N+1, 10, tail), ub (N, 4, tail),
    xr (N+1, 10, tail), ur (N, 4, tail), fd (N+1, 3, tail), x0 (1, 10, tail).
    Returns the SparseQp field tuple + dx0_p, all in packed layout.
    """
    Np1, _, nb = xb.shape[:3]
    N = Np1 - 1
    dt = xb.dtype
    jd = jac_dtype or dt
    nbt = _nbt_for(nb)
    grid = (nb // nbt, N)

    out_shape = (
        jax.ShapeDtypeStruct((N, 16, nb, SUB, LANE), jd),  # hq stages
        jax.ShapeDtypeStruct((N, NX, nb, SUB, LANE), dt),  # gx stages
        jax.ShapeDtypeStruct((N, NU, nb, SUB, LANE), dt),  # gu
        jax.ShapeDtypeStruct((N, 40, nb, SUB, LANE), jd),  # a
        jax.ShapeDtypeStruct((N, 30, nb, SUB, LANE), jd),  # b omega cols
        jax.ShapeDtypeStruct((N, 6, nb, SUB, LANE), dt),  # bc collective
        jax.ShapeDtypeStruct((N, NX, nb, SUB, LANE), dt),  # r
        jax.ShapeDtypeStruct((N, NU, nb, SUB, LANE), dt),  # lu
        jax.ShapeDtypeStruct((N, NU, nb, SUB, LANE), dt),  # uu
        jax.ShapeDtypeStruct((N, 3, nb, SUB, LANE), dt),  # lx stages
        jax.ShapeDtypeStruct((N, 3, nb, SUB, LANE), dt),  # ux stages
        jax.ShapeDtypeStruct((1, 16, nb, SUB, LANE), jd),  # hq terminal
        jax.ShapeDtypeStruct((1, NX, nb, SUB, LANE), dt),  # gx terminal
        jax.ShapeDtypeStruct((1, NX, nb, SUB, LANE), dt),  # dx0
    )
    outs = pl.pallas_call(
        functools.partial(
            _lin_kernel,
            h=h, substeps=substeps, mass=mass, gravity=gravity,
            stage_scale=stage_scale, q_diag=q_diag, r_diag=r_diag,
            u_lo=u_lo, u_hi=u_hi, v_lo=v_lo, v_hi=v_hi,
            with_dist=with_dist, n_stages=N,
        ),
        grid=grid,
        in_specs=[
            _stage_spec(NX, False, N, nbt),  # xb at s
            _stage_spec(NX, False, N, nbt, shift=1),  # xb at s+1
            _stage_spec(NU, False, N, nbt),  # ub
            _stage_spec(NX, False, N, nbt),  # xr at s
            _stage_spec(NU, False, N, nbt),  # ur
            _stage_spec(3, False, N, nbt),  # fd
            _pinned_spec(NX, N, nbt),  # xr terminal
            _pinned_spec(NX, 0, nbt),  # x0
        ],
        out_specs=[
            _stage_spec(16, False, N, nbt),
            _stage_spec(NX, False, N, nbt),
            _stage_spec(NU, False, N, nbt),
            _stage_spec(40, False, N, nbt),
            _stage_spec(30, False, N, nbt),
            _stage_spec(6, False, N, nbt),
            _stage_spec(NX, False, N, nbt),
            _stage_spec(NU, False, N, nbt),
            _stage_spec(NU, False, N, nbt),
            _stage_spec(3, False, N, nbt),
            _stage_spec(3, False, N, nbt),
            _pinned_spec(16, 0, nbt),
            _pinned_spec(NX, 0, nbt),
            _pinned_spec(NX, 0, nbt),
        ],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xb, xb, ub, xr, ur, fd, xr, x0)

    (hq_s, gx_s, gu, a, b, bc, r, lu, uu, lx_s, ux_s, hqT, gxT, dx0_p) = outs
    hq = jnp.concatenate([hq_s, hqT], axis=0)
    gx = jnp.concatenate([gx_s, gxT], axis=0)
    # velocity box active on interior stages 1..N-1 only (acados x-bound
    # stage set, `nmpc_body_rate_ctl.py:56-61`): rows 0 and N are +-big
    big_row = jnp.full((1, 3, nb, SUB, LANE), big, dt)
    lx = jnp.concatenate([-big_row, lx_s[1:], -big_row], axis=0)
    ux = jnp.concatenate([big_row, ux_s[1:], big_row], axis=0)
    return hq, gx, gu, a, b, bc, r, lu, uu, lx, ux, dx0_p
