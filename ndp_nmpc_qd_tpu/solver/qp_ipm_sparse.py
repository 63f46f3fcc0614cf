"""Interior-point loop over the fused structure-sparse Riccati kernels.

Same primal-dual algorithm as `qp_ipm.solve_qp` / `qp_ipm_packed.ipm_packed`
(fixed iteration count, fraction-to-boundary, slack elimination of the box
constraints) but each iteration is exactly TWO kernel launches: the fused
backward sweep (which assembles ghat/rhat in-kernel — no separate lane-matvec
pass re-reading the stage matrices) and the structured forward rollout. The
host-side part of an iteration is only the O(stage x 4) slack/dual
elementwise algebra and the step-size reductions.

See `ops/pallas/riccati_sparse.py` for the kernel layout story and
`ocp_sparse.py` for the data layout.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.pallas.riccati_sparse import riccati_iter_fused, riccati_sweep_sparse
from .ocp_sparse import SparseQp, SparseQpConsts
from .qp_ipm import ipm_corr_terms, ipm_max_step, ipm_slack_init


class IpmWarm(NamedTuple):
    """Dual warm-start state carried across control ticks (packed layout).

    Slacks are NOT carried — they are re-derived from the current tick's
    bounds at the zero primal iterate (always feasible), which makes the
    warm start robust to arbitrary reference/bound changes; the multipliers
    encode the active set, which is what actually persists between ticks.
    `mu < 0` is the cold sentinel (fresh reset): that scenario falls back to
    the classic lambda = mu0/s initialization.
    """

    lu_lo: jnp.ndarray  # (N, nu, nb, SUB, 128)
    lu_up: jnp.ndarray
    lx_lo: jnp.ndarray  # (N+1, 3, nb, SUB, 128)
    lx_up: jnp.ndarray
    mu: jnp.ndarray  # (nb, SUB, 128); < 0 => cold


def sparse_defect(p: SparseQp, consts: SparseQpConsts, zx, zu):
    """A zx + B zu + r - zx' in packed layout (jnp, for the final residual).

    zx (N+1, 10, tail), zu (N, 4, tail) -> (N, 10, tail).
    """
    N = p.r.shape[0]
    tail = p.r.shape[2:]
    h = consts.h
    apq = p.a[:, 0:12].reshape((N, 3, 4) + tail)
    avq = p.a[:, 12:24].reshape((N, 3, 4) + tail)
    aqq = p.a[:, 24:40].reshape((N, 4, 4) + tail)
    dt_c = p.bc.dtype
    bp = jnp.concatenate(
        [p.b[:, 0:9].astype(dt_c).reshape((N, 3, 3) + tail),
         p.bc[:, 0:3].reshape((N, 3, 1) + tail)], axis=2
    )
    bv = jnp.concatenate(
        [p.b[:, 9:18].astype(dt_c).reshape((N, 3, 3) + tail),
         p.bc[:, 3:6].reshape((N, 3, 1) + tail)], axis=2
    )
    bq = p.b[:, 18:30].astype(dt_c).reshape((N, 4, 3) + tail)
    zq = zx[:N, 6:10]
    zw = zu[:, 0:3]
    out_p = (
        zx[:N, 0:3] + h * zx[:N, 3:6]
        + jnp.sum(apq * zq[:, None], axis=2)
        + jnp.sum(bp * zu[:, None], axis=2)
    )
    out_v = (
        zx[:N, 3:6]
        + jnp.sum(avq * zq[:, None], axis=2)
        + jnp.sum(bv * zu[:, None], axis=2)
    )
    out_q = jnp.sum(aqq * zq[:, None], axis=2) + jnp.sum(
        bq * zw[:, None], axis=2
    )
    return jnp.concatenate([out_p, out_v, out_q], axis=1) + p.r - zx[1:]


def sparse_rollout_zero_u(p: SparseQp, consts: SparseQpConsts, dx0_p):
    """Zero-control rollout in packed layout: zx[0] = dx0, zx[k+1] =
    A_k zx[k] + r_k. The far-regime feasible start (see qp_ipm.solve_qp):
    dynamics-exact and strictly interior in the control box.

    dx0_p: (1, 10, tail) -> (N+1, 10, tail).
    """
    N = p.r.shape[0]
    tail = p.r.shape[2:]
    h = consts.h
    apq = p.a[:, 0:12].reshape((N, 3, 4) + tail)
    avq = p.a[:, 12:24].reshape((N, 3, 4) + tail)
    aqq = p.a[:, 24:40].reshape((N, 4, 4) + tail)

    def roll(dx, inp):
        apq_k, avq_k, aqq_k, r_k = inp
        zq = dx[6:10]
        out_p = dx[0:3] + h * dx[3:6] + jnp.sum(apq_k * zq[None], axis=1)
        out_v = dx[3:6] + jnp.sum(avq_k * zq[None], axis=1)
        out_q = jnp.sum(aqq_k * zq[None], axis=1)
        nxt = jnp.concatenate([out_p, out_v, out_q], axis=0) + r_k
        return nxt, nxt

    _, z_tail = jax.lax.scan(roll, dx0_p[0], (apq, avq, aqq, p.r))
    return jnp.concatenate([dx0_p, z_tail], axis=0)


def ipm_sparse(
    p: SparseQp,
    consts: SparseQpConsts,
    dx0_p: jnp.ndarray,
    *,
    num_iters: int = 12,
    sigma: float = 0.1,
    tau: float = 0.95,
    mu_init: float = 1.0,
    s_min: float = 1e-3,
    mu_min: float = 1e-12,
    interpret: bool = False,
    warm: IpmWarm | None = None,
    lqr_start: bool = True,
    fuse_glue: bool = True,
    whole_kernel: bool = False,
    xu_bar: tuple | None = None,
):
    """Returns (zx (N+1,10,tail), zu (N,4,tail), mu (tail), eq_res (tail),
    new_warm: IpmWarm).

    With `warm=None` (one-shot solve): clipped-LQR primal warm start + cold
    duals, exactly the published algorithm. With an `IpmWarm` carried from
    the previous control tick: zero primal start (the RTI iterate shift
    already absorbed last tick's solution), slacks re-derived from the
    current bounds, multipliers and barrier weight carried — scenarios whose
    `warm.mu < 0` (fresh reset) fall back to the cold initialization
    in-graph.

    `whole_kernel=True` runs the ENTIRE solve in one persistent-VMEM Pallas
    launch (`ops/pallas/ipm_whole.py`): the stage payload streams from HBM
    once instead of once per iteration. Implies the zero-control start
    (`lqr_start` is ignored — that is the validated equal-accuracy
    configuration for the warm-started path, see the note below) and the
    res2-based equality residual. warm=None is handled by passing the cold
    sentinel for every lane.

    `xu_bar=(x_bar, u_bar)` (kernel layout) switches the FIRST TWO return
    values to the UPDATED RTI iterates x_bar + zx / u_bar + zu (the SQP
    axpy folded in-kernel on the whole-kernel path, in XLA otherwise) —
    the kernel-layout-resident RtiState mode (`solver/rti.py packed_state`).
    """
    Np1, nx = p.gx.shape[:2]
    N = Np1 - 1
    nu = p.gu.shape[1]
    dt = p.gx.dtype
    nb = p.gx.shape[2]
    tail = tuple(p.gx.shape[2:])  # (nb, SUB, 128)

    if whole_kernel:
        from ..ops.pallas.ipm_whole import riccati_ipm_whole

        if warm is None:
            warm = IpmWarm(
                lu_lo=jnp.zeros((N, nu) + tail, dt),
                lu_up=jnp.zeros((N, nu) + tail, dt),
                lx_lo=jnp.zeros((Np1, 3) + tail, dt),
                lx_up=jnp.zeros((Np1, 3) + tail, dt),
                mu=jnp.full(tail, -1.0, dt),
            )
        zx, zu, lul, luu, lxl, lxu, mu5, eq5 = riccati_ipm_whole(
            p.hq, p.gx, p.gu, p.a, p.b, p.bc, p.r,
            p.lu, p.uu, p.lx, p.ux,
            warm.lu_lo, warm.lu_up, warm.lx_lo, warm.lx_up, warm.mu,
            dx0_p,
            xu_bar[0] if xu_bar is not None else None,
            xu_bar[1] if xu_bar is not None else None,
            h=consts.h, diag6_stage=consts.diag6_stage,
            diag6_term=consts.diag6_term, rdiag_stage=consts.rdiag_stage,
            tau=tau, sigma=sigma, mu_init=mu_init, s_min=s_min,
            mu_min=mu_min, num_iters=num_iters, interpret=interpret,
        )
        mu = mu5[0, 0]
        new_warm = IpmWarm(lu_lo=lul, lu_up=luu, lx_lo=lxl, lx_up=lxu, mu=mu)
        return zx, zu, mu, eq5[0, 0], new_warm

    sweep = functools.partial(
        riccati_sweep_sparse,
        h=consts.h, diag6_stage=consts.diag6_stage,
        diag6_term=consts.diag6_term, rdiag_stage=consts.rdiag_stage,
        interpret=interpret,
    )

    zeros_su = jnp.zeros((N, nu) + tail, dt)
    zeros_sx = jnp.zeros((Np1, nx) + tail, dt)
    zeros_s3 = jnp.zeros((Np1, 3) + tail, dt)

    mu0 = jnp.asarray(mu_init, dt)
    n_cons = 2 * N * nu + 2 * Np1 * 3

    if lqr_start:
        # clipped-LQR primal warm start: strictly inside the control box —
        # robust for far-from-reference states (cold) and lands near the
        # previous solution when the problem barely moved (warm)
        margin = 1e-3 * (p.uu - p.lu)
        zx, zu, _, zx_hold = sweep(
            p.hq, p.gx, p.gu, p.a, p.b, p.bc, p.r,
            zeros_sx, zeros_su, zeros_su, zeros_s3, zeros_su, zeros_s3, dx0_p,
            clip_lo=p.lu + margin, clip_hi=p.uu - margin,
            with_hold=True,  # zero-control rollout rides the same kernel pass
        )
        # Far-regime feasible fallback (mirrors qp_ipm.solve_qp — see the
        # long note there): where the clipped-LQR rollout's planned
        # velocities leave their box (offsets >~13-18 m), switch that
        # SCENARIO's start to the zero-control rollout — dynamics-exact and
        # strictly interior, so the iterate stays feasible at any step
        # length and the health flag holds at any distance. Per-lane
        # selection; nominal scenarios are untouched.
        v_feasible = jnp.all(
            (zx[:, 3:6] >= p.lx) & (zx[:, 3:6] <= p.ux), axis=(0, 1)
        )  # (tail,)
        zx = jnp.where(v_feasible, zx, zx_hold)
        zu = jnp.where(v_feasible, zu, 0.0)
    else:
        # zero-control-rollout start only (the far-regime fallback start,
        # used for EVERY lane): dynamics-exact and strictly interior in the
        # control box, so the defect-contraction and health-flag arguments
        # hold unchanged — it just starts further from the optimum than the
        # clipped-LQR point. Intended for the dual-warm-started path, where
        # the carried multipliers already encode the active set and the
        # extra backward sweep of the LQR start is not worth its HBM pass
        # (measured equal-accuracy on the golden missions; see
        # tools/validate_backends.py --warm-iters N --no-lqr-start).
        zx = sparse_rollout_zero_u(p, consts, dx0_p)
        zu = zeros_su
    su_lo, su_up = ipm_slack_init(p.lu, p.uu, zu, s_min)
    sx_lo, sx_up = ipm_slack_init(p.lx, p.ux, zx[:, 3:6], s_min)

    if warm is None:
        lam = (mu0 / su_lo, mu0 / su_up, mu0 / sx_lo, mu0 / sx_up)
        mu_start = jnp.full(tail, mu0, dt)
    else:
        # dual warm start: multipliers carried from the previous control
        # tick (they encode the active set, which persists between ticks);
        # scenarios with the cold sentinel fall back to mu0/s
        cold = warm.mu < 0  # (tail,) fresh-reset sentinel

        def mix(l_carried, s):
            return jnp.where(cold, mu0 / s, jnp.maximum(l_carried, 1e-12))

        lam = (
            mix(warm.lu_lo, su_lo), mix(warm.lu_up, su_up),
            mix(warm.lx_lo, sx_lo), mix(warm.lx_up, sx_up),
        )
        comp0 = (
            jnp.sum(su_lo * lam[0], axis=(0, 1))
            + jnp.sum(su_up * lam[1], axis=(0, 1))
            + jnp.sum(sx_lo * lam[2], axis=(0, 1))
            + jnp.sum(sx_up * lam[3], axis=(0, 1))
        ) / n_cons
        mu_start = jnp.where(
            cold, mu0, jnp.clip(sigma * comp0, mu_min, mu0)
        )

    def step_fused(carry, _):
        """One iteration over the glue-fused kernels: the slack elimination,
        direction recovery, step-size ratios, and complementarity partials
        all ride the two kernel launches (`riccati_iter_fused`); host-side
        work is two stage-axis reductions + the axpy updates."""
        zx, zu, su_lo, su_up, sx_lo, sx_up, lu_lo, lu_up, lx_lo, lx_up, mu = carry
        dx0_res = dx0_p - zx[:1]
        (
            d_zx, d_zu, dsu_lo, dsu_up, dlu_lo, dlu_up,
            dsx_lo, dsx_up, dlx_lo, dlx_up, a_p, a_d, comp4, res2_r,
        ) = riccati_iter_fused(
            p.hq, p.gx, p.gu, p.a, p.b, p.bc, p.r, zx, zu,
            su_lo, su_up, sx_lo, sx_up, lu_lo, lu_up, lx_lo, lx_up,
            p.lu, p.uu, p.lx, p.ux, mu, dx0_res,
            h=consts.h, diag6_stage=consts.diag6_stage,
            diag6_term=consts.diag6_term, rdiag_stage=consts.rdiag_stage,
            tau=tau, interpret=interpret,
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
            comp4[0] + a_p * comp4[1] + a_d * comp4[2]
            + a_p * a_d * comp4[3]
        ) / n_cons
        mu = jnp.maximum(sigma * comp, mu_min)
        res2 = res2_r + jnp.sum(dx0_res * dx0_res, axis=(0, 1))
        return (
            (zx, zu, su_lo, su_up, sx_lo, sx_up, lu_lo, lu_up, lx_lo, lx_up, mu),
            (res2, a_p),
        )

    def step(carry, _):
        zx, zu, su_lo, su_up, sx_lo, sx_up, lu_lo, lu_up, lx_lo, lx_up, mu = carry
        vx = zx[:, 3:6]
        sig_u, corr_u, ru_lo, ru_up, rcu_lo, rcu_up = ipm_corr_terms(
            zu, p.lu, p.uu, su_lo, su_up, lu_lo, lu_up, mu
        )
        sig_x, corr_x, rx_lo, rx_up, rcx_lo, rcx_up = ipm_corr_terms(
            vx, p.lx, p.ux, sx_lo, sx_up, lx_lo, lx_up, mu
        )
        dx0_res = dx0_p - zx[:1]

        d_zx, d_zu, _rhat = sweep(
            p.hq, p.gx, p.gu, p.a, p.b, p.bc, p.r,
            zx, zu, sig_u, sig_x, corr_u, corr_x, dx0_res,
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
        # the defect contracts EXACTLY by (1 - a_p) per iteration (the Newton
        # direction solves the linearized equalities), so the residual norm of
        # the final iterate is (1 - a_p) * ||(rhat, dx0_res)|| of the last
        # iteration — no extra matvec needed
        res2 = jnp.sum(_rhat * _rhat, axis=(0, 1)) + jnp.sum(
            dx0_res * dx0_res, axis=(0, 1)
        )
        return (
            (zx, zu, su_lo, su_up, sx_lo, sx_up, lu_lo, lu_up, lx_lo, lx_up, mu),
            (res2, a_p),
        )

    carry = (zx, zu, su_lo, su_up, sx_lo, sx_up, *lam, mu_start)
    carry, ys = jax.lax.scan(
        step_fused if fuse_glue else step, carry, None, length=num_iters
    )
    zx, zu = carry[0], carry[1]
    mu = carry[-1]

    if warm is None or num_iters == 0:
        eq = sparse_defect(p, consts, zx, zu)
        eq_res = jnp.sqrt(
            jnp.sum(eq * eq, axis=(0, 1))
            + jnp.sum((dx0_p - zx[:1]) ** 2, axis=(0, 1))
        )
    else:
        res2, a_p = ys
        eq_res = (1.0 - a_p[-1]) * jnp.sqrt(res2[-1])
    new_warm = IpmWarm(
        lu_lo=carry[6], lu_up=carry[7], lx_lo=carry[8], lx_up=carry[9], mu=mu
    )
    if xu_bar is not None:
        zx = zx + xu_bar[0]
        zu = zu + xu_bar[1]
    return zx, zu, mu, eq_res, new_warm
