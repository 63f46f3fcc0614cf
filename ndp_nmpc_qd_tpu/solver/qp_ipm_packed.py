"""Batched box-constrained OCP QP solve in packed (batch-on-lanes) layout.

Same interior-point algorithm as `qp_ipm.solve_qp`, but the whole scenario
batch is solved by Pallas Riccati kernels operating on (stage, element,
nb, 8, 128) arrays (see `ops/pallas/riccati.py`), with the cheap per-bound
elementwise updates expressed as lane-parallel jnp ops in the same layout.
This is the production TPU path: at B = 2048 the Riccati sweep drops from
~26 ms (XLA scan over (B,10,10) arrays) to ~1.9 ms, and f32 accuracy
IMPROVES because the kernel's VPU FMAs avoid the MXU's bf16 default
precision.

Requires Hxu == 0 (true for this OCP — diagonal W, no state/control residual
coupling; asserted cheaply upstream). Batch is padded to a multiple of 1024.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.pallas.riccati import (
    BLOCK,
    SUB,
    pack,
    riccati_sweep_packed,
    unpack,
)
from .ocp import QpData
from .ocp_packed import PackedQp
from .qp_ipm import QpSolution, ipm_corr_terms, ipm_max_step, ipm_slack_init


def _pad_to_block(x: jnp.ndarray) -> jnp.ndarray:
    B = x.shape[0]
    pad = (-B) % BLOCK
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.tile(x[:1], (pad,) + (1,) * (x.ndim - 1))])


def pack_qp(qp: QpData) -> PackedQp:
    """Batch-first QpData -> packed layout (pads batch to BLOCK)."""
    f = lambda x: pack(_pad_to_block(x))
    return PackedQp(
        hxx=f(qp.Hxx), huu=f(qp.Huu), gx=f(qp.gx), gu=f(qp.gu),
        a=f(qp.A), b=f(qp.B), r=f(qp.r),
        lu=f(qp.lu), uu=f(qp.uu), lx=f(qp.lx), ux=f(qp.ux),
    )


def _matvec(h_packed, z, n, m):
    """y[s,i] = sum_j H[s, i*m+j] z[s,j] in packed layout.

    h_packed (S, n*m, nb,8,128), z (S, m, nb,8,128) -> (S, n, nb,8,128).
    Pure lane-parallel broadcast-multiply-reduce (no MXU).
    """
    S = h_packed.shape[0]
    tail = h_packed.shape[2:]
    H = h_packed.reshape((S, n, m) + tail)
    return jnp.sum(H * z[:, None], axis=2)


def solve_qp_packed(
    qp: QpData,
    dx0: jnp.ndarray,
    *,
    num_iters: int = 12,
    sigma: float = 0.1,
    tau: float = 0.95,
    mu_init: float = 1.0,
    s_min: float = 1e-3,
    mu_min: float = 1e-12,
    interpret: bool = False,
) -> QpSolution:
    """Batched solve; qp leaves have leading batch axis B, dx0 (B, nx).

    Returns QpSolution with batch-first (B, ...) arrays, mu/eq_res (B,).
    """
    B = dx0.shape[0]
    nx = qp.gx.shape[2]
    nu = qp.gu.shape[2]
    p = pack_qp(qp)
    dx0_p = pack(_pad_to_block(dx0)[:, None, :])  # (1, nx, nb,8,128)
    zx, zu, mu, eq_res = ipm_packed(
        p, dx0_p, num_iters=num_iters, sigma=sigma, tau=tau,
        mu_init=mu_init, s_min=s_min, mu_min=mu_min, interpret=interpret,
    )
    dx_out = unpack(zx, (nx,))[:B]
    du_out = unpack(zu, (nu,))[:B]
    return QpSolution(dx_out, du_out, mu.reshape(-1)[:B], eq_res.reshape(-1)[:B])


def ipm_packed(
    p: PackedQp,
    dx0_p: jnp.ndarray,
    *,
    num_iters: int = 12,
    sigma: float = 0.1,
    tau: float = 0.95,
    mu_init: float = 1.0,
    s_min: float = 1e-3,
    mu_min: float = 1e-12,
    interpret: bool = False,
):
    """The interior-point loop entirely in packed layout.

    Returns (zx (N+1,nx,nb,8,128), zu (N,nu,...), mu (nb,8,128),
    eq_res (nb,8,128)).
    """
    Np1, nx = p.gx.shape[:2]
    N = Np1 - 1
    nu = p.gu.shape[1]
    dt = p.gx.dtype
    nb = p.gx.shape[2]
    tail = (nb, SUB, 128)

    sweep = functools.partial(riccati_sweep_packed, interpret=interpret)

    zeros_su = jnp.zeros((N, nu) + tail, dt)
    zeros_sx = jnp.zeros((N + 1, nx) + tail, dt)

    # clipped-LQR warm start (control box with interior margin)
    margin = 1e-3 * (p.uu - p.lu)
    zx, zu = sweep(
        p.hxx, zeros_sx, p.huu, zeros_su, p.gx, p.gu, p.a, p.b, p.r, dx0_p,
        clip_lo=p.lu + margin, clip_hi=p.uu - margin,
    )

    def interior(lo, hi, v):
        return ipm_slack_init(lo, hi, v, s_min)

    vx0 = zx[:, 3:6]
    su_lo, su_up = interior(p.lu, p.uu, zu)
    sx_lo, sx_up = interior(p.lx, p.ux, vx0)
    mu0 = jnp.asarray(mu_init, dt)
    lam = (mu0 / su_lo, mu0 / su_up, mu0 / sx_lo, mu0 / sx_up)
    n_cons = 2 * N * nu + 2 * (N + 1) * 3
    corr_terms = ipm_corr_terms

    def step(carry, _):
        zx, zu, su_lo, su_up, sx_lo, sx_up, lu_lo, lu_up, lx_lo, lx_up, mu = carry
        vx = zx[:, 3:6]
        sig_u, corr_u, ru_lo, ru_up, rcu_lo, rcu_up = corr_terms(
            zu, p.lu, p.uu, su_lo, su_up, lu_lo, lu_up, mu
        )
        sig_x3, corr_x, rx_lo, rx_up, rcx_lo, rcx_up = corr_terms(
            vx, p.lx, p.ux, sx_lo, sx_up, lx_lo, lx_up, mu
        )
        sig_x = jnp.zeros_like(zx).at[:, 3:6].set(sig_x3)

        ghat_x = p.gx + _matvec(p.hxx, zx, nx, nx)
        ghat_x = ghat_x.at[:, 3:6].add(corr_x)
        ghat_u = p.gu + _matvec(p.huu, zu, nu, nu) + corr_u

        rhat = (
            _matvec(p.a, zx[:N], nx, nx)
            + _matvec(p.b, zu, nx, nu)
            + p.r
            - zx[1:]
        )
        dx0_res = dx0_p - zx[:1]

        # Newton direction: exact equality-constrained solve via the kernel.
        # The kernel integrates the defect r; pass rhat and the current-
        # iterate residual at the initial stage.
        d_zx, d_zu = sweep(
            p.hxx, sig_x, p.huu, sig_u, ghat_x, ghat_u, p.a, p.b, rhat,
            dx0_res,
        )

        d_vx = d_zx[:, 3:6]
        dsu_lo = d_zu + ru_lo
        dsu_up = -d_zu + ru_up
        dsx_lo = d_vx + rx_lo
        dsx_up = -d_vx + rx_up
        dlu_lo = -(rcu_lo + lu_lo * dsu_lo) / su_lo
        dlu_up = -(rcu_up + lu_up * dsu_up) / su_up
        dlx_lo = -(rcx_lo + lx_lo * dsx_lo) / sx_lo
        dlx_up = -(rcx_up + lx_up * dsx_up) / sx_up

        def max_step(v, dv):
            return ipm_max_step(v, dv, tau, axes=(0, 1))

        a_p = jnp.minimum(
            jnp.minimum(max_step(su_lo, dsu_lo), max_step(su_up, dsu_up)),
            jnp.minimum(max_step(sx_lo, dsx_lo), max_step(sx_up, dsx_up)),
        )
        a_d = jnp.minimum(
            jnp.minimum(max_step(lu_lo, dlu_lo), max_step(lu_up, dlu_up)),
            jnp.minimum(max_step(lx_lo, dlx_lo), max_step(lx_up, dlx_up)),
        )

        zx = zx + a_p * d_zx
        zu = zu + a_p * d_zu
        su_lo = su_lo + a_p * dsu_lo
        su_up = su_up + a_p * dsu_up
        sx_lo = sx_lo + a_p * dsx_lo
        sx_up = sx_up + a_p * dsx_up
        lu_lo = lu_lo + a_d * dlu_lo
        lu_up = lu_up + a_d * dlu_up
        lx_lo = lx_lo + a_d * dlx_lo
        lx_up = lx_up + a_d * dlx_up

        comp = (
            jnp.sum(su_lo * lu_lo, axis=(0, 1))
            + jnp.sum(su_up * lu_up, axis=(0, 1))
            + jnp.sum(sx_lo * lx_lo, axis=(0, 1))
            + jnp.sum(sx_up * lx_up, axis=(0, 1))
        ) / n_cons
        mu = jnp.maximum(sigma * comp, mu_min)
        return (zx, zu, su_lo, su_up, sx_lo, sx_up, lu_lo, lu_up, lx_lo, lx_up, mu), None

    carry = (zx, zu, su_lo, su_up, sx_lo, sx_up, *lam, jnp.full(tail, mu0, dt))
    carry, _ = jax.lax.scan(step, carry, None, length=num_iters)
    zx, zu = carry[0], carry[1]
    mu = carry[-1]

    eq = (
        _matvec(p.a, zx[:N], nx, nx) + _matvec(p.b, zu, nx, nu) + p.r - zx[1:]
    )
    eq_res = jnp.sqrt(
        jnp.sum(eq * eq, axis=(0, 1)) + jnp.sum((dx0_p - zx[:1]) ** 2, axis=(0, 1))
    )
    return zx, zu, mu, eq_res
