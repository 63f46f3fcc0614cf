"""Box-constrained time-varying LQR solve: Riccati recursion inside a
primal-dual interior-point method.

This is the TPU-native replacement for HPIPM/BLASFEO
(`nmpc_body_rate_ctl.py:71-72` selects PARTIAL_CONDENSING_HPIPM): the same
OCP-structured QP, but expressed as fixed-iteration-count `lax.scan`s so the
whole solve jits, vmaps over thousands of scenarios, and never leaves the
device. Each IPM iteration reduces the bound constraints to a diagonal
Hessian/gradient modification (standard slack elimination) and solves the
resulting equality-constrained tv-LQR exactly with one backward/forward
Riccati sweep.

Design notes (TPU-first):
- No early exit, no pivoting: IPM iteration count is static (`num_iters`);
  fraction-to-boundary steps keep every iterate strictly feasible in (s, λ).
- All stage matrices are small (10x10, 10x4, 4x4); with a leading scenario
  batch vmapped in, XLA lays the batch on the vector lanes so the recursions
  run as wide VPU/MXU ops. The scan over N=20 stages is the only sequential
  dimension.
- Infeasible-start: z = 0 need not satisfy the dynamics defect; the Riccati
  sweep absorbs the residuals and they contract by (1 - alpha) per iteration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ocp import BX_IDX, QpData


class QpSolution(NamedTuple):
    dx: jnp.ndarray  # (N+1, nx)
    du: jnp.ndarray  # (N, nu)
    mu: jnp.ndarray  # final complementarity measure (scalar)
    eq_res: jnp.ndarray  # final dynamics-defect norm (scalar)


def riccati_solve(
    qp: QpData, sig_u, sig_x_b, ghat_x, ghat_u, rhat, dx0_res,
    clip_lo=None, clip_hi=None,
):
    """Exact solve of the equality-constrained tv-LQR Newton system.

    Args:
      qp: stage data (uses Hxx/Hxu/Huu/A/B only).
      sig_u: (N, nu) diagonal barrier addition to Huu.
      sig_x_b: (N+1, n_bx) diagonal barrier addition to the bounded state
        components (scattered into Hxx at BX_IDX).
      ghat_x/ghat_u: modified gradients.
      rhat: (N, nx) dynamics defects at the current IPM iterate.
      dx0_res: (nx,) initial-state residual.
      clip_lo/clip_hi: optional (N, nu) control boxes applied during the
        forward rollout (clipped-LQR warm start). Must be None for exact
        Newton directions.
    Returns:
      (delta_x (N+1,nx), delta_u (N,nu)).

    All matmuls pin float32 precision: on TPU the MXU's default bf16 passes
    lose ~3 decimal digits through the 20-stage recursion (measured 5e-2
    absolute control error vs 2e-6 at full precision).
    """
    with jax.default_matmul_precision("float32"):
        return _riccati_solve_impl(
            qp, sig_u, sig_x_b, ghat_x, ghat_u, rhat, dx0_res, clip_lo, clip_hi
        )


def _riccati_solve_impl(
    qp: QpData, sig_u, sig_x_b, ghat_x, ghat_u, rhat, dx0_res,
    clip_lo=None, clip_hi=None,
):
    N = qp.A.shape[0]
    nx = qp.A.shape[1]

    # scatter barrier diagonals onto the box-bounded state components
    Hxx = qp.Hxx.at[
        jnp.arange(N + 1)[:, None], BX_IDX[None, :], BX_IDX[None, :]
    ].add(sig_x_b)
    Huu = qp.Huu + jax.vmap(jnp.diag)(sig_u)

    # ---- backward Riccati sweep ----
    P_N = Hxx[N]
    p_N = ghat_x[N]

    def backward(carry, inp):
        P, p = carry
        A, B, Hxx_i, Hxu_i, Huu_i, gx_i, gu_i, r_i = inp
        Pr_p = P @ r_i + p
        PA = P @ A
        PB = P @ B
        Qh = Hxx_i + A.T @ PA
        S = Hxu_i.T + B.T @ PA  # (nu, nx)
        Rh = Huu_i + B.T @ PB
        qv = gx_i + A.T @ Pr_p
        rv = gu_i + B.T @ Pr_p
        # SPD 4x4 solve; batched under vmap
        Rh_chol = jnp.linalg.cholesky(Rh)
        Kk = jax.scipy.linalg.cho_solve(
            (Rh_chol, True), jnp.concatenate([S, rv[:, None]], axis=1)
        )
        K = -Kk[:, :nx]
        k = -Kk[:, nx]
        P_new = Qh + S.T @ K
        P_new = 0.5 * (P_new + P_new.T)
        p_new = qv + S.T @ k
        return (P_new, p_new), (K, k)

    (_, _), (Ks, ks) = jax.lax.scan(
        backward,
        (P_N, p_N),
        (qp.A, qp.B, Hxx[:N], qp.Hxu, Huu, ghat_x[:N], ghat_u, rhat),
        reverse=True,
    )

    # ---- forward rollout ----
    if clip_lo is None:
        clip_lo = jnp.full_like(ks, -jnp.inf)
        clip_hi = jnp.full_like(ks, jnp.inf)

    def forward(dx, inp):
        A, B, r_i, K, k, lo, hi = inp
        du = jnp.clip(K @ dx + k, lo, hi)
        dx_next = A @ dx + B @ du + r_i
        return dx_next, (dx, du)

    dx_N, (dxs, dus) = jax.lax.scan(
        forward, dx0_res, (qp.A, qp.B, rhat, Ks, ks, clip_lo, clip_hi)
    )
    delta_x = jnp.concatenate([dxs, dx_N[None]], axis=0)
    return delta_x, dus


# ---- elementwise IPM building blocks, shared by the scan path below and
# ---- the packed Pallas path (qp_ipm_packed.ipm_packed); layout-agnostic.


def ipm_slack_init(lo, hi, v, s_min):
    """Slack init: the distance to the bound where feasible, its MAGNITUDE
    where violated (so the barrier stays soft and Newton can walk the primal
    back into the box), floored at a range-scaled minimum."""
    floor = jnp.minimum(s_min * jnp.minimum(hi - lo, 1e3), 0.5 * (hi - lo))
    return (
        jnp.maximum(jnp.abs(v - lo), floor),
        jnp.maximum(jnp.abs(hi - v), floor),
    )


def ipm_corr_terms(v, lo, hi, s_lo, s_up, l_lo, l_up, mu):
    """Newton elimination of a two-sided bound's slacks/duals: returns the
    diagonal Hessian addition, the gradient correction, and the residuals
    needed for the direction recovery."""
    r_lo = v - lo - s_lo
    r_up = hi - v - s_up
    rc_lo = s_lo * l_lo - mu
    rc_up = s_up * l_up - mu
    sig = l_lo / s_lo + l_up / s_up
    corr = ipm_corr_from_rc(rc_lo, rc_up, r_lo, r_up, s_lo, s_up, l_lo, l_up)
    return sig, corr, r_lo, r_up, rc_lo, rc_up


def ipm_corr_from_rc(rc_lo, rc_up, r_lo, r_up, s_lo, s_up, l_lo, l_up):
    """Gradient correction of the slack elimination for GIVEN complementarity
    residuals rc (Mehrotra passes rc = s*l - sigma*mu + ds_aff*dl_aff)."""
    return (
        -l_lo + l_up
        + (rc_lo + l_lo * r_lo) / s_lo
        - (rc_up + l_up * r_up) / s_up
    )


def ipm_max_step(v, dv, tau, axes=None):
    """Largest a in (0, 1] with v + a*dv >= (1 - tau) v, reduced over `axes`
    (None = all: per-problem scalar, as used under vmap)."""
    ratio = jnp.where(dv < 0, -tau * v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
    if axes is None:
        return jnp.minimum(1.0, jnp.min(ratio))
    return jnp.minimum(1.0, jnp.min(ratio, axis=axes))


class _IpmState(NamedTuple):
    zx: jnp.ndarray  # (N+1, nx) primal state deltas
    zu: jnp.ndarray  # (N, nu) primal control deltas
    su_lo: jnp.ndarray
    su_up: jnp.ndarray
    sx_lo: jnp.ndarray
    sx_up: jnp.ndarray
    lu_lo: jnp.ndarray
    lu_up: jnp.ndarray
    lx_lo: jnp.ndarray
    lx_up: jnp.ndarray
    mu: jnp.ndarray


def solve_qp(
    qp: QpData,
    dx0: jnp.ndarray,
    *,
    num_iters: int = 12,
    sigma: float = 0.1,
    tau: float = 0.95,
    mu_init: float = 1.0,
    s_min: float = 1e-3,
    mu_min: float = 1e-12,
    mehrotra: bool = False,
) -> QpSolution:
    """Primal-dual IPM for the box-constrained OCP QP.

    Bounds: lu <= zu <= uu per stage; lx <= zx[:, (3,4,5)] <= ux per node
    (masked +/-BIG entries are handled naturally — their barrier terms vanish).

    `mehrotra=True` switches each iteration to a predictor-corrector pair
    (two Riccati solves sharing the barrier diagonals): the affine predictor
    measures how far pure Newton can go, sets the centering weight
    sigma = (mu_aff/mu)^3 adaptively, and the corrector compensates the
    ds*dl second-order complementarity error. This is what HPIPM runs
    (hpipm_mode BALANCE, `nmpc_body_rate_ctl.py:71-72`); it converges the
    active set in roughly half the iterations and — unlike the fixed-sigma
    loop — does not stall when the optimum saturates the velocity box far
    from the reference (the >=18 m regime, ROADMAP r1 item 4).
    """
    N, nu = qp.gu.shape
    nxp1, n_bx = qp.lx.shape
    dtype = qp.gx.dtype
    dx0 = dx0.astype(dtype)

    def interior(lo, hi, v):
        return ipm_slack_init(lo, hi, v, s_min)

    # Primal warm start: clipped-LQR — one zero-barrier Riccati backward pass,
    # then a forward rollout whose controls are clipped into the box (with a
    # small interior margin). The iterate satisfies the dynamics EXACTLY and
    # the control bounds strictly; since the dynamics are linear, subsequent
    # Newton directions solve the homogeneous dynamics and any step length
    # preserves dynamic feasibility — fraction-to-boundary alpha only has to
    # reconcile slacks. This keeps the fixed iteration count small even for
    # initial states far from the reference (where the unconstrained LQR
    # would otherwise start far outside the box).
    zeros_sig_u = jnp.zeros((N, nu), dtype)
    zeros_sig_x = jnp.zeros((nxp1, n_bx), dtype)
    margin = 1e-3 * (qp.uu - qp.lu)
    zx_lqr, zu_lqr = riccati_solve(
        qp, zeros_sig_u, zeros_sig_x, qp.gx, qp.gu, qp.r, dx0,
        clip_lo=qp.lu + margin, clip_hi=qp.uu - margin,
    )
    # Far-regime fallback (measured 2026-08-18, see DESIGN.md): when the
    # clipped-LQR rollout's velocities leave their box (initial states
    # >~13-18 m from the reference — the LQR wants speeds the box forbids),
    # every start tried — LQR, v-projected, zero, Mehrotra on top — jams
    # fraction-to-boundary at alpha ~ 1e-2 against the saturated control
    # slacks and the fixed iteration budget returns a not-ok iterate.
    # Instead, SELECT a zero-control rollout start per problem: it is
    # dynamics-exact (so every Newton direction stays in the equality
    # nullspace and iterates remain dynamically feasible at ANY step length)
    # and strictly interior in both boxes (controls at the hover reference,
    # velocities = the vehicle's own). The IPM then walks a feasible path
    # toward the saturated optimum: the returned first-stage control is a
    # feasible braking command whose quality the RTI loop refines tick over
    # tick, and the health flag (eq_res + both boxes) holds by construction
    # at any distance — HPIPM-class robustness for the flight envelope
    # (`nmpc_body_rate_ctl.py:71-72`). Nominal-regime solves are untouched:
    # the selection only flips where the LQR start is v-infeasible.
    def _roll_zero_u(dx, Ar):
        A_k, r_k = Ar
        nxt = A_k @ dx + r_k
        return nxt, nxt

    _, z_tail = jax.lax.scan(_roll_zero_u, dx0, (qp.A, qp.r))
    zx_hold = jnp.concatenate([dx0[None], z_tail], axis=0)
    v_feasible = jnp.all(
        (zx_lqr[:, 3:6] >= qp.lx) & (zx_lqr[:, 3:6] <= qp.ux)
    )
    zx0 = jnp.where(v_feasible, zx_lqr, zx_hold)
    zu0 = jnp.where(v_feasible, zu_lqr, jnp.zeros_like(zu_lqr))
    su_lo0, su_up0 = interior(qp.lu, qp.uu, zu0)
    sx_lo0, sx_up0 = interior(qp.lx, qp.ux, zx0[:, 3:6])
    mu0 = jnp.asarray(mu_init, dtype)

    st = _IpmState(
        zx0, zu0,
        su_lo0, su_up0, sx_lo0, sx_up0,
        mu0 / su_lo0, mu0 / su_up0, mu0 / sx_lo0, mu0 / sx_up0,
        mu0,
    )

    n_cons = 2 * N * nu + 2 * nxp1 * n_bx
    corr_terms = ipm_corr_terms

    def _lin_terms(st: _IpmState):
        """Objective gradient at the iterate + dynamics defects (shared by
        the plain step and both Mehrotra passes)."""
        gx_lin = (
            qp.gx
            + jnp.einsum("nij,nj->ni", qp.Hxx, st.zx)
            + jnp.concatenate(
                [jnp.einsum("nij,nj->ni", qp.Hxu, st.zu),
                 jnp.zeros((1, qp.gx.shape[1]), dtype)],
                axis=0,
            )
        )
        gu_lin = (
            qp.gu
            + jnp.einsum("nji,nj->ni", qp.Hxu, st.zx[:N])
            + jnp.einsum("nij,nj->ni", qp.Huu, st.zu)
        )
        rhat = (
            jnp.einsum("nij,nj->ni", qp.A, st.zx[:N])
            + jnp.einsum("nij,nj->ni", qp.B, st.zu)
            + qp.r
            - st.zx[1:]
        )
        return gx_lin, gu_lin, rhat, dx0 - st.zx[0]

    def _directions(st, d_zx, d_zu, ru_lo, ru_up, rx_lo, rx_up,
                    rcu_lo, rcu_up, rcx_lo, rcx_up):
        """Slack/dual Newton directions from the elimination identities."""
        d_vx = d_zx[:, 3:6]
        dsu_lo = d_zu + ru_lo
        dsu_up = -d_zu + ru_up
        dsx_lo = d_vx + rx_lo
        dsx_up = -d_vx + rx_up
        dlu_lo = -(rcu_lo + st.lu_lo * dsu_lo) / st.su_lo
        dlu_up = -(rcu_up + st.lu_up * dsu_up) / st.su_up
        dlx_lo = -(rcx_lo + st.lx_lo * dsx_lo) / st.sx_lo
        dlx_up = -(rcx_up + st.lx_up * dsx_up) / st.sx_up
        return (dsu_lo, dsu_up, dsx_lo, dsx_up), (dlu_lo, dlu_up, dlx_lo, dlx_up)

    def step_mehrotra(st: _IpmState, _):
        vx = st.zx[:, 3:6]
        # shared residuals + barrier diagonals (both passes use the same
        # factorization inputs)
        ru_lo = st.zu - qp.lu - st.su_lo
        ru_up = qp.uu - st.zu - st.su_up
        rx_lo = vx - qp.lx - st.sx_lo
        rx_up = qp.ux - vx - st.sx_up
        sig_u = st.lu_lo / st.su_lo + st.lu_up / st.su_up
        sig_x = st.lx_lo / st.sx_lo + st.lx_up / st.sx_up
        gx_lin, gu_lin, rhat, dx0_res = _lin_terms(st)

        def solve_with_rc(rcu_lo, rcu_up, rcx_lo, rcx_up):
            corr_u = ipm_corr_from_rc(
                rcu_lo, rcu_up, ru_lo, ru_up, st.su_lo, st.su_up,
                st.lu_lo, st.lu_up,
            )
            corr_x = ipm_corr_from_rc(
                rcx_lo, rcx_up, rx_lo, rx_up, st.sx_lo, st.sx_up,
                st.lx_lo, st.lx_up,
            )
            ghat_x = gx_lin.at[:, 3:6].add(corr_x)
            ghat_u = gu_lin + corr_u
            d_zx, d_zu = riccati_solve(
                qp, sig_u, sig_x, ghat_x, ghat_u, rhat, dx0_res
            )
            ds, dl = _directions(
                st, d_zx, d_zu, ru_lo, ru_up, rx_lo, rx_up,
                rcu_lo, rcu_up, rcx_lo, rcx_up,
            )
            return d_zx, d_zu, ds, dl

        # --- affine predictor (pure Newton, mu = 0) ---
        rc_aff = (
            st.su_lo * st.lu_lo, st.su_up * st.lu_up,
            st.sx_lo * st.lx_lo, st.sx_up * st.lx_up,
        )
        _, _, ds_a, dl_a = solve_with_rc(*rc_aff)
        s_all = (st.su_lo, st.su_up, st.sx_lo, st.sx_up)
        l_all = (st.lu_lo, st.lu_up, st.lx_lo, st.lx_up)
        a_p_aff = jnp.min(
            jnp.stack([ipm_max_step(s, d, 1.0) for s, d in zip(s_all, ds_a)])
        )
        a_d_aff = jnp.min(
            jnp.stack([ipm_max_step(l, d, 1.0) for l, d in zip(l_all, dl_a)])
        )
        comp_now = sum(jnp.sum(s * l) for s, l in zip(s_all, l_all)) / n_cons
        comp_aff = sum(
            jnp.sum((s + a_p_aff * ds) * (l + a_d_aff * dl))
            for s, ds, l, dl in zip(s_all, ds_a, l_all, dl_a)
        ) / n_cons
        sig_dyn = jnp.clip((comp_aff / jnp.maximum(comp_now, mu_min)) ** 3, 0.0, 1.0)
        mu_t = jnp.maximum(sig_dyn * comp_now, mu_min)

        # --- corrector: centering + second-order compensation. The ds*dl
        # term is scaled by the REALIZED affine step lengths (weighted
        # corrector): with infeasible far-regime starts the full-step
        # products are wildly pessimistic and destabilize the direction. ---
        rc_corr = tuple(
            s * l - mu_t + (a_p_aff * ds) * (a_d_aff * dl)
            for s, l, ds, dl in zip(s_all, l_all, ds_a, dl_a)
        )
        d_zx, d_zu, ds_c, dl_c = solve_with_rc(*rc_corr)

        # adaptive fraction-to-boundary, capped: tau -> 1 crushes slacks to
        # denormals and NaNs the next iteration's l/s diagonals
        tau_k = jnp.clip(1.0 - comp_now, tau, 0.99)
        a_p = jnp.min(
            jnp.stack([ipm_max_step(s, d, tau_k) for s, d in zip(s_all, ds_c)])
        )
        a_d = jnp.min(
            jnp.stack([ipm_max_step(l, d, tau_k) for l, d in zip(l_all, dl_c)])
        )

        new = _IpmState(
            st.zx + a_p * d_zx,
            st.zu + a_p * d_zu,
            st.su_lo + a_p * ds_c[0],
            st.su_up + a_p * ds_c[1],
            st.sx_lo + a_p * ds_c[2],
            st.sx_up + a_p * ds_c[3],
            st.lu_lo + a_d * dl_c[0],
            st.lu_up + a_d * dl_c[1],
            st.lx_lo + a_d * dl_c[2],
            st.lx_up + a_d * dl_c[3],
            st.mu,
        )
        comp = sum(
            jnp.sum(s * l)
            for s, l in zip(
                (new.su_lo, new.su_up, new.sx_lo, new.sx_up),
                (new.lu_lo, new.lu_up, new.lx_lo, new.lx_up),
            )
        ) / n_cons
        new = new._replace(mu=jnp.maximum(comp, mu_min))
        return new, None

    def step(st: _IpmState, _):
        vx = st.zx[:, 3:6]
        sig_u, corr_u, ru_lo, ru_up, rcu_lo, rcu_up = corr_terms(
            st.zu, qp.lu, qp.uu, st.su_lo, st.su_up, st.lu_lo, st.lu_up, st.mu
        )
        sig_x, corr_x, rx_lo, rx_up, rcx_lo, rcx_up = corr_terms(
            vx, qp.lx, qp.ux, st.sx_lo, st.sx_up, st.lx_lo, st.lx_up, st.mu
        )

        # objective-gradient at current primal iterate
        gx_lin = (
            qp.gx
            + jnp.einsum("nij,nj->ni", qp.Hxx, st.zx)
            + jnp.concatenate(
                [jnp.einsum("nij,nj->ni", qp.Hxu, st.zu),
                 jnp.zeros((1, qp.gx.shape[1]), dtype)],
                axis=0,
            )
        )
        gu_lin = (
            qp.gu
            + jnp.einsum("nji,nj->ni", qp.Hxu, st.zx[:N])
            + jnp.einsum("nij,nj->ni", qp.Huu, st.zu)
        )
        ghat_x = gx_lin.at[:, 3:6].add(corr_x)
        ghat_u = gu_lin + corr_u

        rhat = (
            jnp.einsum("nij,nj->ni", qp.A, st.zx[:N])
            + jnp.einsum("nij,nj->ni", qp.B, st.zu)
            + qp.r
            - st.zx[1:]
        )
        dx0_res = dx0 - st.zx[0]

        d_zx, d_zu = riccati_solve(qp, sig_u, sig_x, ghat_x, ghat_u, rhat, dx0_res)

        d_vx = d_zx[:, 3:6]
        # slack / dual Newton directions (from the elimination identities)
        dsu_lo = d_zu + ru_lo
        dsu_up = -d_zu + ru_up
        dsx_lo = d_vx + rx_lo
        dsx_up = -d_vx + rx_up
        dlu_lo = -(rcu_lo + st.lu_lo * dsu_lo) / st.su_lo
        dlu_up = -(rcu_up + st.lu_up * dsu_up) / st.su_up
        dlx_lo = -(rcx_lo + st.lx_lo * dsx_lo) / st.sx_lo
        dlx_up = -(rcx_up + st.lx_up * dsx_up) / st.sx_up

        def max_step(v, dv):
            return ipm_max_step(v, dv, tau)

        a_p = jnp.minimum(
            jnp.minimum(max_step(st.su_lo, dsu_lo), max_step(st.su_up, dsu_up)),
            jnp.minimum(max_step(st.sx_lo, dsx_lo), max_step(st.sx_up, dsx_up)),
        )
        a_d = jnp.minimum(
            jnp.minimum(max_step(st.lu_lo, dlu_lo), max_step(st.lu_up, dlu_up)),
            jnp.minimum(max_step(st.lx_lo, dlx_lo), max_step(st.lx_up, dlx_up)),
        )

        new = _IpmState(
            st.zx + a_p * d_zx,
            st.zu + a_p * d_zu,
            st.su_lo + a_p * dsu_lo,
            st.su_up + a_p * dsu_up,
            st.sx_lo + a_p * dsx_lo,
            st.sx_up + a_p * dsx_up,
            st.lu_lo + a_d * dlu_lo,
            st.lu_up + a_d * dlu_up,
            st.lx_lo + a_d * dlx_lo,
            st.lx_up + a_d * dlx_up,
            st.mu,
        )
        comp = (
            jnp.sum(new.su_lo * new.lu_lo) + jnp.sum(new.su_up * new.lu_up)
            + jnp.sum(new.sx_lo * new.lx_lo) + jnp.sum(new.sx_up * new.lx_up)
        ) / n_cons
        new = new._replace(mu=jnp.maximum(sigma * comp, mu_min))
        return new, None

    # pin f32 matmul precision for the gradient-assembly einsums (see
    # riccati_solve docstring for the bf16-on-MXU rationale)
    with jax.default_matmul_precision("float32"):
        st, _ = jax.lax.scan(
            step_mehrotra if mehrotra else step, st, None, length=num_iters
        )

    eq_res = jnp.sqrt(
        jnp.sum(
            (
                jnp.einsum("nij,nj->ni", qp.A, st.zx[:N])
                + jnp.einsum("nij,nj->ni", qp.B, st.zu)
                + qp.r
                - st.zx[1:]
            )
            ** 2
        )
        + jnp.sum((dx0 - st.zx[0]) ** 2)
    )
    return QpSolution(st.zx, st.zu, st.mu, eq_res)
