"""Fused structure-sparse Riccati sweep kernels (batch-on-lanes layout).

Second-generation kernels over `riccati.py`, exploiting two facts measured on
the v5e: the IPM is HBM-bandwidth-bound (each iteration re-reads every stage
matrix), and most stage-matrix elements are compile-time constants for this
OCP (see `solver/ocp_sparse.py`):

- A is block-triangular [[I, h*I, Apq], [0, I, Avq], [0, 0, Aqq]]: 40 varying
  elements instead of 100, and the Riccati products P@A / A^T(PA) collapse to
  copies + h-shifted adds + one 10x4 contraction.
- B has a zero quaternion<-collective column: 36 elements instead of 40.
- Hxx = const diag(6) (+) Hq (16 elements instead of 100); Huu is a constant
  diagonal baked into the kernel (0 bytes).
- The IPM's gradient/defect assembly (ghat = g + H z + corr, rhat = A z +
  B zu + r - z') is fused INTO the backward kernel: the separate lane-matvec
  pass of `qp_ipm_packed` — which re-read hxx/a/b from HBM every iteration —
  disappears, and the backward emits rhat for the forward kernel.

Same math as `qp_ipm.riccati_solve` (checked element-level in
`tests/test_sparse_path.py`); constants are baked in as compile-time floats
so every FMA still runs on full (8, 128) tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .riccati import BLOCK, LANE, SUB, _chol4, _chol4_solve

NX = 10
NU = 4


def _vec(ref, n):
    """n-vector of (nbt, 8, 128) tiles (the block carries nbt batch blocks
    per grid step — fewer grid steps amortize the per-step overhead)."""
    return [ref[0, i] for i in range(n)]


def _load_blocks(a_ref, b_ref, bc_ref):
    """Unpack the sparse A/B payloads into lists of (nbt, 8, 128) tiles.

    b_ref carries the 30 omega columns, bc_ref the 6 always-f32 collective
    columns (see `solver/ocp_sparse.py` on the precision split)."""
    apq = [[a_ref[0, i * 4 + j] for j in range(4)] for i in range(3)]
    avq = [[a_ref[0, 12 + i * 4 + j] for j in range(4)] for i in range(3)]
    aqq = [[a_ref[0, 24 + i * 4 + j] for j in range(4)] for i in range(4)]
    bp = [
        [b_ref[0, i * 3 + l] for l in range(3)] + [bc_ref[0, i]]
        for i in range(3)
    ]
    bv = [
        [b_ref[0, 9 + i * 3 + l] for l in range(3)] + [bc_ref[0, 3 + i]]
        for i in range(3)
    ]
    bq = [[b_ref[0, 18 + i * 3 + l] for l in range(3)] for i in range(4)]
    return apq, avq, aqq, bp, bv, bq


def _bt_dot(bp, bv, bq, vec, l):
    """(B^T vec)[l] for a 10-vector of tiles; bq lacks the c column."""
    s = sum(bp[t][l] * vec[t] for t in range(3))
    s = s + sum(bv[t][l] * vec[3 + t] for t in range(3))
    if l < 3:
        s = s + sum(bq[t][l] * vec[6 + t] for t in range(4))
    return s


def _glue_pair(v, lo, hi, s_lo, s_up, l_lo, l_up, mu):
    """Slack elimination of one two-sided bound row, tile algebra.

    Mirrors `solver/qp_ipm.ipm_corr_terms` (one shared reciprocal per slack
    replaces the four VPU divides — a divide lowers to ~7 ops); returns
    (sig, corr, r_lo, r_up, rc_lo, rc_up) so the forward kernel can recover
    the slack/dual directions without re-materializing these through HBM.
    """
    r_lo = v - lo - s_lo
    r_up = hi - v - s_up
    rc_lo = s_lo * l_lo - mu
    rc_up = s_up * l_up - mu
    rs_lo = 1.0 / s_lo
    rs_up = 1.0 / s_up
    sig = l_lo * rs_lo + l_up * rs_up
    corr = (
        -l_lo + l_up
        + (rc_lo + l_lo * r_lo) * rs_lo
        - (rc_up + l_up * r_up) * rs_up
    )
    return sig, corr, r_lo, r_up, rc_lo, rc_up


def _terminal_init_core(
    P_scr, p_scr, hqT, gxT, zxT, sigT, corrT, *, diag6_term
):
    """Terminal Riccati init: P = diag6_term (+) HqT + diag(sigT on v),
    p = ghat_N. hqT (16), gxT (10), sigT/corrT (3) are tile lists."""
    for i in range(NX):
        for j in range(NX):
            P_scr[i * NX + j] = jnp.zeros_like(zxT[0])
    for i in range(6):
        P_scr[i * NX + i] = diag6_term[i] + jnp.zeros_like(zxT[0])
        p_scr[i] = gxT[i] + diag6_term[i] * zxT[i]
    for i in range(3):
        P_scr[(3 + i) * NX + (3 + i)] = (
            P_scr[(3 + i) * NX + (3 + i)] + sigT[i]
        )
        p_scr[3 + i] = p_scr[3 + i] + corrT[i]
    for i in range(4):
        for j in range(4):
            # explicit cast: hq may be stored bf16, scratch is f32
            P_scr[(6 + i) * NX + (6 + j)] = hqT[i * 4 + j].astype(
                zxT[0].dtype
            )
        p_scr[6 + i] = gxT[6 + i] + sum(
            hqT[i * 4 + j] * zxT[6 + j] for j in range(4)
        )


def _backward_kernel(
    hq_ref, gx_ref, gu_ref, a_ref, b_ref, bc_ref, r_ref,
    zx_ref, zx1_ref, zu_ref, sigu_ref, sigx_ref, corru_ref, corrx_ref,
    hqT_ref, gxT_ref, zxT_ref, sigxT_ref, corrxT_ref,
    K_out, k_out, rhat_out,
    P_scr, p_scr,
    *, h, diag6_stage, diag6_term, rdiag_stage,
):
    s_rev = pl.program_id(1)

    @pl.when(s_rev == 0)
    def _():
        zxT = _vec(zxT_ref, NX)
        _terminal_init_core(
            P_scr, p_scr, _vec(hqT_ref, 16), _vec(gxT_ref, NX), zxT,
            [sigxT_ref[0, i] for i in range(3)],
            [corrxT_ref[0, i] for i in range(3)],
            diag6_term=diag6_term,
        )

    P = [[P_scr[i * NX + j] for j in range(NX)] for i in range(NX)]
    p = [p_scr[i] for i in range(NX)]

    Hq = [[hq_ref[0, i * 4 + j] for j in range(4)] for i in range(4)]
    gx = _vec(gx_ref, NX)
    gu = _vec(gu_ref, NU)
    apq, avq, aqq, bp, bv, bq = _load_blocks(a_ref, b_ref, bc_ref)
    r = _vec(r_ref, NX)
    zx = _vec(zx_ref, NX)
    zx1 = _vec(zx1_ref, NX)
    zu = _vec(zu_ref, NU)
    sig_u = _vec(sigu_ref, NU)
    sig_x = _vec(sigx_ref, 3)
    corr_u = _vec(corru_ref, NU)
    corr_x = _vec(corrx_ref, 3)
    K, kf, rh = _riccati_stage_core(
        P, p, P_scr, p_scr, Hq, gx, gu, apq, avq, aqq, bp, bv, bq, r,
        zx, zx1, zu, sig_u, sig_x, corr_u, corr_x,
        h=h, diag6_stage=diag6_stage, rdiag_stage=rdiag_stage,
    )
    _store_stage_gains(K_out, k_out, rhat_out, K, kf, rh)


def _store_stage_gains(K_out, k_out, rhat_out, K, kf, rh):
    for l in range(NU):
        for kk in range(NX):
            K_out[0, l * NX + kk] = K[l][kk]
        k_out[0, l] = kf[l]
    if rhat_out is not None:
        for i in range(NX):
            rhat_out[0, i] = rh[i]


def _riccati_stage_core(
    P, p, P_scr, p_scr, Hq, gx, gu, apq, avq, aqq, bp, bv, bq, r,
    zx, zx1, zu, sig_u, sig_x, corr_u, corr_x,
    *, h, diag6_stage, rdiag_stage,
):
    """One backward Riccati stage on loaded tiles: fused ghat/rhat assembly,
    structured products, Cholesky gain solve, P/p scratch update. Returns
    (K, kf, rh) as tile lists — the caller stores them wherever its layout
    wants (per-stage output blocks here; stage-indexed VMEM scratch in the
    whole-IPM kernel, `ipm_whole.py`)."""
    zq = zx[6:10]

    # ---- fused gradient/defect assembly ----
    ghx = [gx[i] + diag6_stage[i] * zx[i] for i in range(6)]
    for i in range(3):
        ghx[3 + i] = ghx[3 + i] + corr_x[i]
    ghx = ghx + [
        gx[6 + i] + sum(Hq[i][j] * zq[j] for j in range(4)) for i in range(4)
    ]
    ghu = [gu[l] + rdiag_stage[l] * zu[l] + corr_u[l] for l in range(NU)]

    rh = [None] * NX
    for i in range(3):
        rh[i] = (
            zx[i] + h * zx[3 + i]
            + sum(apq[i][j] * zq[j] for j in range(4))
            + sum(bp[i][l] * zu[l] for l in range(4))
            + r[i] - zx1[i]
        )
        rh[3 + i] = (
            zx[3 + i]
            + sum(avq[i][j] * zq[j] for j in range(4))
            + sum(bv[i][l] * zu[l] for l in range(4))
            + r[3 + i] - zx1[3 + i]
        )
    for i in range(4):
        rh[6 + i] = (
            sum(aqq[i][j] * zq[j] for j in range(4))
            + sum(bq[i][l] * zu[l] for l in range(3))
            + r[6 + i] - zx1[6 + i]
        )

    # ---- structured Riccati stage ----
    Prp = [sum(P[i][j] * rh[j] for j in range(NX)) + p[i] for i in range(NX)]

    # PA columns: p-cols copy, v-cols h-shift, q-cols one 10x4 contraction
    PA = [[None] * NX for _ in range(NX)]
    for i in range(NX):
        for j in range(3):
            PA[i][j] = P[i][j]
            PA[i][3 + j] = h * P[i][j] + P[i][3 + j]
        for j in range(4):
            PA[i][6 + j] = (
                sum(P[i][t] * apq[t][j] for t in range(3))
                + sum(P[i][3 + t] * avq[t][j] for t in range(3))
                + sum(P[i][6 + t] * aqq[t][j] for t in range(4))
            )
    PB = [
        [
            sum(P[i][t] * bp[t][l] for t in range(3))
            + sum(P[i][3 + t] * bv[t][l] for t in range(3))
            + (sum(P[i][6 + t] * bq[t][l] for t in range(4)) if l < 3 else 0.0)
            for l in range(NU)
        ]
        for i in range(NX)
    ]

    # Qh = Hxx + diag(sig) + A^T PA. A^T P A is symmetric (P is kept exactly
    # symmetric below), so the expensive q-rows (10-term contractions) are
    # computed only on/above the diagonal and mirrored from the cheap
    # p/v-rows below it — ~300 of the 400 q-row FMAs vanish.
    Qh = [[None] * NX for _ in range(NX)]
    for j in range(NX):
        for i in range(3):
            Qh[i][j] = PA[i][j]
            Qh[3 + i][j] = h * PA[i][j] + PA[3 + i][j]
    for i in range(4):
        for j in range(6 + i):
            Qh[6 + i][j] = Qh[j][6 + i]
        for j in range(6 + i, NX):
            Qh[6 + i][j] = (
                sum(apq[t][i] * PA[t][j] for t in range(3))
                + sum(avq[t][i] * PA[3 + t][j] for t in range(3))
                + sum(aqq[t][i] * PA[6 + t][j] for t in range(4))
            )
    for i in range(6):
        Qh[i][i] = Qh[i][i] + diag6_stage[i]
    for i in range(3):
        Qh[3 + i][3 + i] = Qh[3 + i][3 + i] + sig_x[i]
    for i in range(4):
        for j in range(4):
            Qh[6 + i][6 + j] = Qh[6 + i][6 + j] + Hq[i][j]

    # S = B^T PA (4x10); Rh = const-diag + sig_u + B^T PB (4x4, symmetric:
    # upper triangle computed, lower mirrored)
    S = [[_bt_dot(bp, bv, bq, [PA[t][j] for t in range(NX)], l) for j in range(NX)] for l in range(NU)]
    Rh = [[None] * NU for _ in range(NU)]
    for l in range(NU):
        for m in range(l, NU):
            Rh[l][m] = _bt_dot(bp, bv, bq, [PB[t][m] for t in range(NX)], l)
            if m > l:
                Rh[m][l] = Rh[l][m]
    for l in range(NU):
        Rh[l][l] = Rh[l][l] + (rdiag_stage[l] + sig_u[l])

    qv = [None] * NX
    for i in range(3):
        qv[i] = ghx[i] + Prp[i]
        qv[3 + i] = ghx[3 + i] + h * Prp[i] + Prp[3 + i]
    for i in range(4):
        qv[6 + i] = ghx[6 + i] + (
            sum(apq[t][i] * Prp[t] for t in range(3))
            + sum(avq[t][i] * Prp[3 + t] for t in range(3))
            + sum(aqq[t][i] * Prp[6 + t] for t in range(4))
        )
    rv = [ghu[l] + _bt_dot(bp, bv, bq, Prp, l) for l in range(NU)]

    L = _chol4(Rh)
    cols = [[S[l][k] for l in range(NU)] for k in range(NX)] + [rv]
    sols = _chol4_solve(L, cols)
    K = [[-sols[k][l] for k in range(NX)] for l in range(NU)]
    kf = [-sols[NX][l] for l in range(NU)]

    # P_new = Qh + S^T K = Qh - S^T Rh^{-1} S: symmetric by construction, so
    # only the upper triangle is computed and the lower is mirrored — this
    # IS the symmetrization (replaces the old 0.5*(Pn + Pn^T) pass and
    # drops the 180 lower-triangle FMAs of S^T K).
    Pn = [[None] * NX for _ in range(NX)]
    for i in range(NX):
        for j in range(i, NX):
            Pn[i][j] = Qh[i][j] + sum(S[l][i] * K[l][j] for l in range(NU))
    for i in range(NX):
        for j in range(NX):
            P_scr[i * NX + j] = Pn[i][j] if j >= i else Pn[j][i]
        p_scr[i] = qv[i] + sum(S[l][i] * kf[l] for l in range(NU))
    return K, kf, rh


def _backward_kernel_glue(
    hq_ref, gx_ref, gu_ref, a_ref, b_ref, bc_ref, r_ref,
    zx_ref, zx1_ref, zu_ref,
    sul_ref, suu_ref, lul_ref, luu_ref, lub_ref, uub_ref,
    sxl_ref, sxu_ref, lxl_ref, lxu_ref, lxb_ref, uxb_ref,
    hqT_ref, gxT_ref, zxT_ref,
    sxlT_ref, sxuT_ref, lxlT_ref, lxuT_ref, lxbT_ref, uxbT_ref,
    mu_ref,
    K_out, k_out, rhat_out, res2_out,
    P_scr, p_scr,
    *, h, diag6_stage, diag6_term, rdiag_stage,
):
    """Backward sweep with the IPM slack elimination fused in-kernel: takes
    the raw slack/dual/bound state instead of precomputed sig/corr, so the
    per-iteration elementwise glue (`ipm_corr_terms`) never touches HBM.
    Also emits per-stage partial sums of rhat^2 (for the residual norm)."""
    s_rev = pl.program_id(1)
    mu = mu_ref[0, 0]

    @pl.when(s_rev == 0)
    def _():
        zxT = _vec(zxT_ref, NX)
        sigT, corrT = [], []
        for i in range(3):
            sg, co, *_ = _glue_pair(
                zxT[3 + i], lxbT_ref[0, i], uxbT_ref[0, i],
                sxlT_ref[0, i], sxuT_ref[0, i],
                lxlT_ref[0, i], lxuT_ref[0, i], mu,
            )
            sigT.append(sg)
            corrT.append(co)
        _terminal_init_core(
            P_scr, p_scr, _vec(hqT_ref, 16), _vec(gxT_ref, NX), zxT,
            sigT, corrT, diag6_term=diag6_term,
        )

    P = [[P_scr[i * NX + j] for j in range(NX)] for i in range(NX)]
    p = [p_scr[i] for i in range(NX)]

    Hq = [[hq_ref[0, i * 4 + j] for j in range(4)] for i in range(4)]
    gx = _vec(gx_ref, NX)
    gu = _vec(gu_ref, NU)
    apq, avq, aqq, bp, bv, bq = _load_blocks(a_ref, b_ref, bc_ref)
    r = _vec(r_ref, NX)
    zx = _vec(zx_ref, NX)
    zx1 = _vec(zx1_ref, NX)
    zu = _vec(zu_ref, NU)

    sig_u, corr_u = [], []
    for l in range(NU):
        sg, co, *_ = _glue_pair(
            zu[l], lub_ref[0, l], uub_ref[0, l],
            sul_ref[0, l], suu_ref[0, l], lul_ref[0, l], luu_ref[0, l], mu,
        )
        sig_u.append(sg)
        corr_u.append(co)
    sig_x, corr_x = [], []
    for i in range(3):
        sg, co, *_ = _glue_pair(
            zx[3 + i], lxb_ref[0, i], uxb_ref[0, i],
            sxl_ref[0, i], sxu_ref[0, i], lxl_ref[0, i], lxu_ref[0, i], mu,
        )
        sig_x.append(sg)
        corr_x.append(co)

    K, kf, rh = _riccati_stage_core(
        P, p, P_scr, p_scr, Hq, gx, gu, apq, avq, aqq, bp, bv, bq, r,
        zx, zx1, zu, sig_u, sig_x, corr_u, corr_x,
        h=h, diag6_stage=diag6_stage, rdiag_stage=rdiag_stage,
    )
    _store_stage_gains(K_out, k_out, rhat_out, K, kf, rh)
    res2_out[0, 0] = sum(rh[i] * rh[i] for i in range(NX))


def _dyn_step(apq, avq, aqq, bp, bv, bq, rh, h, dxv, duv):
    """dx_{k+1} = A dx_k + B du_k + rh in the sparse block structure
    (duv=None: zero-control rollout)."""
    dq = dxv[6:10]
    nxt = [None] * NX
    for i in range(3):
        nxt[i] = (
            dxv[i] + h * dxv[3 + i]
            + sum(apq[i][j] * dq[j] for j in range(4))
            + (sum(bp[i][l] * duv[l] for l in range(4)) if duv else 0.0)
            + rh[i]
        )
        nxt[3 + i] = (
            dxv[3 + i]
            + sum(avq[i][j] * dq[j] for j in range(4))
            + (sum(bv[i][l] * duv[l] for l in range(4)) if duv else 0.0)
            + rh[3 + i]
        )
    for i in range(4):
        nxt[6 + i] = (
            sum(aqq[i][j] * dq[j] for j in range(4))
            + (sum(bq[i][l] * duv[l] for l in range(3)) if duv else 0.0)
            + rh[6 + i]
        )
    return nxt


def _ratio(v, dv, tau):
    """Fraction-to-boundary ratio tile: largest a with v + a dv >= (1-tau) v;
    2.0 where dv >= 0 (the caller clamps at 1.0, so any sentinel > 1 works
    and avoids inf arithmetic on the VPU)."""
    neg = dv < 0
    return jnp.where(neg, -tau * v / jnp.where(neg, dv, -1.0), 2.0)


def _bound_steps(d, r_lo, r_up, rc_lo, rc_up, s_lo, s_up, l_lo, l_up, tau):
    """Slack/dual direction recovery for one bound row + its step ratios.

    Mirrors the jnp glue in `qp_ipm_sparse.ipm_sparse.step`:
    ds_lo = d + r_lo, ds_up = -d + r_up, dl = -(rc + l ds)/s.
    Returns (ds_lo, ds_up, dl_lo, dl_up, ap_tile, ad_tile).
    """
    ds_lo = d + r_lo
    ds_up = -d + r_up
    dl_lo = -(rc_lo + l_lo * ds_lo) / s_lo
    dl_up = -(rc_up + l_up * ds_up) / s_up
    ap = jnp.minimum(_ratio(s_lo, ds_lo, tau), _ratio(s_up, ds_up, tau))
    ad = jnp.minimum(_ratio(l_lo, dl_lo, tau), _ratio(l_up, dl_up, tau))
    return ds_lo, ds_up, dl_lo, dl_up, ap, ad


def _forward_kernel_glue(
    a_ref, b_ref, bc_ref, rhat_ref, K_ref, k_ref,
    zu_ref, sul_ref, suu_ref, lul_ref, luu_ref, lub_ref, uub_ref,
    zx_ref, sxl_ref, sxu_ref, lxl_ref, lxu_ref, lxb_ref, uxb_ref,
    zxT_ref, sxlT_ref, sxuT_ref, lxlT_ref, lxuT_ref, lxbT_ref, uxbT_ref,
    mu_ref, dx0_ref,
    dx_out, du_out, dxN_out,
    dsul_out, dsuu_out, dlul_out, dluu_out,
    dsxl_out, dsxu_out, dlxl_out, dlxu_out,
    dsxlT_out, dsxuT_out, dlxlT_out, dlxuT_out,
    ap_out, ad_out, comp_out,
    dx_scr,
    *, h, n_stages, tau,
):
    """Forward rollout with the IPM update glue fused in: emits the primal
    direction AND the slack/dual directions, per-stage fraction-to-boundary
    minima, and per-stage complementarity partial sums — so the host-side
    part of an iteration collapses to two stage-axis min-reductions and the
    axpy updates."""
    s = pl.program_id(1)
    mu = mu_ref[0, 0]

    @pl.when(s == 0)
    def _():
        for i in range(NX):
            dx_scr[i] = dx0_ref[0, i]

    dx = [dx_scr[i] for i in range(NX)]
    apq, avq, aqq, bp, bv, bq = _load_blocks(a_ref, b_ref, bc_ref)
    rh = _vec(rhat_ref, NX)
    K = [[K_ref[0, l * NX + j] for j in range(NX)] for l in range(NU)]
    kf = _vec(k_ref, NU)

    du = [sum(K[l][j] * dx[j] for j in range(NX)) + kf[l] for l in range(NU)]

    for i in range(NX):
        dx_out[0, i] = dx[i]
    for l in range(NU):
        du_out[0, l] = du[l]

    # ---- fused update glue: control box rows (stage s) ----
    zu = _vec(zu_ref, NU)
    ap = None
    ad = None
    c1 = c2 = c3 = c4 = None
    for l in range(NU):
        s_lo, s_up = sul_ref[0, l], suu_ref[0, l]
        l_lo, l_up = lul_ref[0, l], luu_ref[0, l]
        _, _, r_lo, r_up, rc_lo, rc_up = _glue_pair(
            zu[l], lub_ref[0, l], uub_ref[0, l], s_lo, s_up, l_lo, l_up, mu
        )
        ds_lo, ds_up, dl_lo, dl_up, ap_l, ad_l = _bound_steps(
            du[l], r_lo, r_up, rc_lo, rc_up, s_lo, s_up, l_lo, l_up, tau
        )
        dsul_out[0, l] = ds_lo
        dsuu_out[0, l] = ds_up
        dlul_out[0, l] = dl_lo
        dluu_out[0, l] = dl_up
        ap = ap_l if ap is None else jnp.minimum(ap, ap_l)
        ad = ad_l if ad is None else jnp.minimum(ad, ad_l)
        t1 = s_lo * l_lo + s_up * l_up
        t2 = ds_lo * l_lo + ds_up * l_up
        t3 = s_lo * dl_lo + s_up * dl_up
        t4 = ds_lo * dl_lo + ds_up * dl_up
        c1 = t1 if c1 is None else c1 + t1
        c2 = t2 if c2 is None else c2 + t2
        c3 = t3 if c3 is None else c3 + t3
        c4 = t4 if c4 is None else c4 + t4

    # ---- velocity box rows (node s) ----
    zx = _vec(zx_ref, NX)
    for i in range(3):
        s_lo, s_up = sxl_ref[0, i], sxu_ref[0, i]
        l_lo, l_up = lxl_ref[0, i], lxu_ref[0, i]
        _, _, r_lo, r_up, rc_lo, rc_up = _glue_pair(
            zx[3 + i], lxb_ref[0, i], uxb_ref[0, i], s_lo, s_up, l_lo, l_up,
            mu,
        )
        ds_lo, ds_up, dl_lo, dl_up, ap_i, ad_i = _bound_steps(
            dx[3 + i], r_lo, r_up, rc_lo, rc_up, s_lo, s_up, l_lo, l_up, tau
        )
        dsxl_out[0, i] = ds_lo
        dsxu_out[0, i] = ds_up
        dlxl_out[0, i] = dl_lo
        dlxu_out[0, i] = dl_up
        ap = jnp.minimum(ap, ap_i)
        ad = jnp.minimum(ad, ad_i)
        c1 = c1 + s_lo * l_lo + s_up * l_up
        c2 = c2 + ds_lo * l_lo + ds_up * l_up
        c3 = c3 + s_lo * dl_lo + s_up * dl_up
        c4 = c4 + ds_lo * dl_lo + ds_up * dl_up

    nxt = _dyn_step(apq, avq, aqq, bp, bv, bq, rh, h, dx, du)
    for i in range(NX):
        dx_scr[i] = nxt[i]

    ap_out[0, 0] = ap
    ad_out[0, 0] = ad
    comp_out[0, 0] = c1
    comp_out[0, 1] = c2
    comp_out[0, 2] = c3
    comp_out[0, 3] = c4

    @pl.when(s == n_stages - 1)
    def _():
        apT, adT = ap, ad
        c1T, c2T, c3T, c4T = c1, c2, c3, c4
        zxT = _vec(zxT_ref, NX)
        for i in range(NX):
            dxN_out[0, i] = nxt[i]
        for i in range(3):
            s_lo, s_up = sxlT_ref[0, i], sxuT_ref[0, i]
            l_lo, l_up = lxlT_ref[0, i], lxuT_ref[0, i]
            _, _, r_lo, r_up, rc_lo, rc_up = _glue_pair(
                zxT[3 + i], lxbT_ref[0, i], uxbT_ref[0, i],
                s_lo, s_up, l_lo, l_up, mu,
            )
            ds_lo, ds_up, dl_lo, dl_up, ap_i, ad_i = _bound_steps(
                nxt[3 + i], r_lo, r_up, rc_lo, rc_up, s_lo, s_up, l_lo, l_up,
                tau,
            )
            dsxlT_out[0, i] = ds_lo
            dsxuT_out[0, i] = ds_up
            dlxlT_out[0, i] = dl_lo
            dlxuT_out[0, i] = dl_up
            apT = jnp.minimum(apT, ap_i)
            adT = jnp.minimum(adT, ad_i)
            c1T = c1T + s_lo * l_lo + s_up * l_up
            c2T = c2T + ds_lo * l_lo + ds_up * l_up
            c3T = c3T + s_lo * dl_lo + s_up * dl_up
            c4T = c4T + ds_lo * dl_lo + ds_up * dl_up
        # the last stage's tiles carry the terminal node's contributions
        ap_out[0, 0] = apT
        ad_out[0, 0] = adT
        comp_out[0, 0] = c1T
        comp_out[0, 1] = c2T
        comp_out[0, 2] = c3T
        comp_out[0, 3] = c4T


def _forward_kernel(
    a_ref, b_ref, bc_ref, rhat_ref, K_ref, k_ref, lo_ref, hi_ref, dx0_ref,
    *refs,
    h, n_stages, clip, hold,
):
    """Forward rollout; with `hold=True` a SECOND zero-control rollout
    (dx_hold[k+1] = A dx_hold[k] + r) rides the same grid pass — the
    far-regime feasible start (solver/qp_ipm.py) at zero extra HBM reads,
    since the a/r tiles are already in VMEM."""
    if hold:
        (dx_out, du_out, dxN_out, dxh_out, dxhN_out, dx_scr, dxh_scr) = refs
    else:
        (dx_out, du_out, dxN_out, dx_scr) = refs
        dxh_out = dxhN_out = dxh_scr = None
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        for i in range(NX):
            dx_scr[i] = dx0_ref[0, i]
            if hold:
                dxh_scr[i] = dx0_ref[0, i]

    dx = [dx_scr[i] for i in range(NX)]
    apq, avq, aqq, bp, bv, bq = _load_blocks(a_ref, b_ref, bc_ref)
    rh = _vec(rhat_ref, NX)
    K = [[K_ref[0, l * NX + j] for j in range(NX)] for l in range(NU)]
    kf = _vec(k_ref, NU)

    du = [sum(K[l][j] * dx[j] for j in range(NX)) + kf[l] for l in range(NU)]
    if clip:
        lo = _vec(lo_ref, NU)
        hi = _vec(hi_ref, NU)
        du = [jnp.minimum(jnp.maximum(du[l], lo[l]), hi[l]) for l in range(NU)]

    for i in range(NX):
        dx_out[0, i] = dx[i]
    for l in range(NU):
        du_out[0, l] = du[l]

    def step_dyn(dxv, duv):
        return _dyn_step(apq, avq, aqq, bp, bv, bq, rh, h, dxv, duv)

    nxt = step_dyn(dx, du)
    for i in range(NX):
        dx_scr[i] = nxt[i]

    if hold:
        dxh = [dxh_scr[i] for i in range(NX)]
        for i in range(NX):
            dxh_out[0, i] = dxh[i]
        nxth = step_dyn(dxh, None)
        for i in range(NX):
            dxh_scr[i] = nxth[i]

    @pl.when(s == n_stages - 1)
    def _():
        for i in range(NX):
            dxN_out[0, i] = nxt[i]
            if hold:
                dxhN_out[0, i] = nxth[i]


def _stage_spec(d, reverse, n_stages, nbt, shift=0):
    if reverse:
        return pl.BlockSpec(
            (1, d, nbt, SUB, LANE),
            lambda i, s: (n_stages - 1 - s + shift, 0, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (1, d, nbt, SUB, LANE),
        lambda i, s: (s + shift, 0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _pinned_spec(d, stage, nbt):
    return pl.BlockSpec(
        (1, d, nbt, SUB, LANE),
        lambda i, s: (stage, 0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _nbt_for(nb: int) -> int:
    """Batch blocks per grid step: as wide as VMEM comfortably allows.

    nbt=4 keeps the backward kernel's working set (~8.5 MB incl. double
    buffering and the P scratch) under the ~16 MB VMEM budget while cutting
    the number of (sequential) grid steps 4x — the per-step overhead was
    ~40% of the sweep at nbt=1.
    """
    for cand in (4, 2, 1):
        if nb % cand == 0:
            return cand
    return 1


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "diag6_stage", "diag6_term", "rdiag_stage", "tau", "interpret",
    ),
)
def riccati_iter_fused(
    hq, gx, gu, a, b, bc, r, zx, zu,
    su_lo, su_up, sx_lo, sx_up, lu_lo, lu_up, lx_lo, lx_up,
    lub, uub, lxb, uxb, mu, dx0_res,
    *, h, diag6_stage, diag6_term, rdiag_stage, tau,
    interpret: bool = False,
):
    """One COMPLETE IPM iteration's device work in two kernel launches.

    Equivalent to: `ipm_corr_terms` on both bounds + `riccati_sweep_sparse`
    + slack/dual direction recovery + per-element fraction-to-boundary
    ratios + complementarity partials — with all of the elementwise glue
    computed inside the kernels instead of as separate XLA passes over HBM.

    Shapes as `riccati_sweep_sparse`, plus the slack/dual/bound state:
    su/lu (N, nu, tail), sx/lx (N+1, 3, tail), bounds lub/uub (N, nu, tail),
    lxb/uxb (N+1, 3, tail), mu (tail).

    Returns (dx (N+1,10,tail), du (N,4,tail),
             dsu_lo, dsu_up, dlu_lo, dlu_up (N,4,tail),
             dsx_lo, dsx_up, dlx_lo, dlx_up (N+1,3,tail),
             ap (tail), ad (tail) — fraction-to-boundary step sizes already
             reduced and clamped at 1,
             comp4 (4, tail) — [sum s*l, sum ds*l, sum s*dl, sum ds*dl] over
             ALL constraint rows (comp after the update = (c1 + ap*c2 +
             ad*c3 + ap*ad*c4) / n_cons),
             res2 (tail) — sum of rhat^2 over stages (add the dx0 residual
             outside)).
    """
    Np1, _, nb = hq.shape[:3]
    N = Np1 - 1
    dt = gx.dtype
    nbt = _nbt_for(nb)
    grid = (nb // nbt, N)
    mu5 = mu.reshape((1, 1) + mu.shape)

    consts = dict(
        h=h, diag6_stage=diag6_stage, diag6_term=diag6_term,
        rdiag_stage=rdiag_stage,
    )
    sd = lambda d, n=N: jax.ShapeDtypeStruct((n, d, nb, SUB, LANE), dt)
    sd1 = lambda d: jax.ShapeDtypeStruct((1, d, nb, SUB, LANE), dt)

    K, kf, rhat, res2_st = pl.pallas_call(
        functools.partial(_backward_kernel_glue, **consts),
        grid=grid,
        in_specs=[
            _stage_spec(16, True, N, nbt),  # hq
            _stage_spec(NX, True, N, nbt),  # gx
            _stage_spec(NU, True, N, nbt),  # gu
            _stage_spec(40, True, N, nbt),  # a
            _stage_spec(30, True, N, nbt),  # b omega cols
            _stage_spec(6, True, N, nbt),  # bc collective cols
            _stage_spec(NX, True, N, nbt),  # r
            _stage_spec(NX, True, N, nbt),  # zx at s
            _stage_spec(NX, True, N, nbt, shift=1),  # zx at s+1
            _stage_spec(NU, True, N, nbt),  # zu
            _stage_spec(NU, True, N, nbt),  # su_lo
            _stage_spec(NU, True, N, nbt),  # su_up
            _stage_spec(NU, True, N, nbt),  # lu_lo
            _stage_spec(NU, True, N, nbt),  # lu_up
            _stage_spec(NU, True, N, nbt),  # lub
            _stage_spec(NU, True, N, nbt),  # uub
            _stage_spec(3, True, N, nbt),  # sx_lo
            _stage_spec(3, True, N, nbt),  # sx_up
            _stage_spec(3, True, N, nbt),  # lx_lo
            _stage_spec(3, True, N, nbt),  # lx_up
            _stage_spec(3, True, N, nbt),  # lxb
            _stage_spec(3, True, N, nbt),  # uxb
            _pinned_spec(16, N, nbt),  # hq terminal
            _pinned_spec(NX, N, nbt),  # gx terminal
            _pinned_spec(NX, N, nbt),  # zx terminal
            _pinned_spec(3, N, nbt),  # sx_lo terminal
            _pinned_spec(3, N, nbt),  # sx_up terminal
            _pinned_spec(3, N, nbt),  # lx_lo terminal
            _pinned_spec(3, N, nbt),  # lx_up terminal
            _pinned_spec(3, N, nbt),  # lxb terminal
            _pinned_spec(3, N, nbt),  # uxb terminal
            _pinned_spec(1, 0, nbt),  # mu
        ],
        out_specs=[
            _stage_spec(NU * NX, True, N, nbt),
            _stage_spec(NU, True, N, nbt),
            _stage_spec(NX, True, N, nbt),
            _stage_spec(1, True, N, nbt),
        ],
        out_shape=(sd(NU * NX), sd(NU), sd(NX), sd(1)),
        scratch_shapes=[
            pltpu.VMEM((NX * NX, nbt, SUB, LANE), dt),
            pltpu.VMEM((NX, nbt, SUB, LANE), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        hq, gx, gu, a, b, bc, r, zx, zx, zu,
        su_lo, su_up, lu_lo, lu_up, lub, uub,
        sx_lo, sx_up, lx_lo, lx_up, lxb, uxb,
        hq, gx, zx, sx_lo, sx_up, lx_lo, lx_up, lxb, uxb, mu5,
    )

    outs = pl.pallas_call(
        functools.partial(_forward_kernel_glue, h=h, n_stages=N, tau=tau),
        grid=grid,
        in_specs=[
            _stage_spec(40, False, N, nbt),  # a
            _stage_spec(30, False, N, nbt),  # b omega cols
            _stage_spec(6, False, N, nbt),  # bc collective cols
            _stage_spec(NX, False, N, nbt),  # rhat
            _stage_spec(NU * NX, False, N, nbt),  # K
            _stage_spec(NU, False, N, nbt),  # k
            _stage_spec(NU, False, N, nbt),  # zu
            _stage_spec(NU, False, N, nbt),  # su_lo
            _stage_spec(NU, False, N, nbt),  # su_up
            _stage_spec(NU, False, N, nbt),  # lu_lo
            _stage_spec(NU, False, N, nbt),  # lu_up
            _stage_spec(NU, False, N, nbt),  # lub
            _stage_spec(NU, False, N, nbt),  # uub
            _stage_spec(NX, False, N, nbt),  # zx at node s
            _stage_spec(3, False, N, nbt),  # sx_lo
            _stage_spec(3, False, N, nbt),  # sx_up
            _stage_spec(3, False, N, nbt),  # lx_lo
            _stage_spec(3, False, N, nbt),  # lx_up
            _stage_spec(3, False, N, nbt),  # lxb
            _stage_spec(3, False, N, nbt),  # uxb
            _pinned_spec(NX, N, nbt),  # zx terminal
            _pinned_spec(3, N, nbt),  # sx_lo terminal
            _pinned_spec(3, N, nbt),  # sx_up terminal
            _pinned_spec(3, N, nbt),  # lx_lo terminal
            _pinned_spec(3, N, nbt),  # lx_up terminal
            _pinned_spec(3, N, nbt),  # lxb terminal
            _pinned_spec(3, N, nbt),  # uxb terminal
            _pinned_spec(1, 0, nbt),  # mu
            _pinned_spec(NX, 0, nbt),  # dx0
        ],
        out_specs=[
            _stage_spec(NX, False, N, nbt),  # dx nodes 0..N-1
            _stage_spec(NU, False, N, nbt),  # du
            _pinned_spec(NX, 0, nbt),  # dx node N
            _stage_spec(NU, False, N, nbt),  # dsu_lo
            _stage_spec(NU, False, N, nbt),  # dsu_up
            _stage_spec(NU, False, N, nbt),  # dlu_lo
            _stage_spec(NU, False, N, nbt),  # dlu_up
            _stage_spec(3, False, N, nbt),  # dsx_lo nodes 0..N-1
            _stage_spec(3, False, N, nbt),  # dsx_up
            _stage_spec(3, False, N, nbt),  # dlx_lo
            _stage_spec(3, False, N, nbt),  # dlx_up
            _pinned_spec(3, 0, nbt),  # dsx_lo node N
            _pinned_spec(3, 0, nbt),  # dsx_up node N
            _pinned_spec(3, 0, nbt),  # dlx_lo node N
            _pinned_spec(3, 0, nbt),  # dlx_up node N
            _stage_spec(1, False, N, nbt),  # ap per stage
            _stage_spec(1, False, N, nbt),  # ad per stage
            _stage_spec(4, False, N, nbt),  # comp partials
        ],
        out_shape=(
            sd(NX), sd(NU), sd1(NX),
            sd(NU), sd(NU), sd(NU), sd(NU),
            sd(3), sd(3), sd(3), sd(3),
            sd1(3), sd1(3), sd1(3), sd1(3),
            sd(1), sd(1), sd(4),
        ),
        scratch_shapes=[pltpu.VMEM((NX, nbt, SUB, LANE), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        a, b, bc, rhat, K, kf,
        zu, su_lo, su_up, lu_lo, lu_up, lub, uub,
        zx, sx_lo, sx_up, lx_lo, lx_up, lxb, uxb,
        zx, sx_lo, sx_up, lx_lo, lx_up, lxb, uxb,
        mu5, dx0_res,
    )

    (dx019, du, dxN,
     dsu_lo, dsu_up, dlu_lo, dlu_up,
     dsxl019, dsxu019, dlxl019, dlxu019,
     dsxlT, dsxuT, dlxlT, dlxuT,
     ap_st, ad_st, comp_st) = outs
    dx = jnp.concatenate([dx019, dxN], axis=0)
    dsx_lo = jnp.concatenate([dsxl019, dsxlT], axis=0)
    dsx_up = jnp.concatenate([dsxu019, dsxuT], axis=0)
    dlx_lo = jnp.concatenate([dlxl019, dlxlT], axis=0)
    dlx_up = jnp.concatenate([dlxu019, dlxuT], axis=0)
    ap = jnp.minimum(1.0, jnp.min(ap_st[:, 0], axis=0))
    ad = jnp.minimum(1.0, jnp.min(ad_st[:, 0], axis=0))
    comp4 = jnp.sum(comp_st, axis=0)
    res2 = jnp.sum(res2_st[:, 0], axis=0)
    return (
        dx, du, dsu_lo, dsu_up, dlu_lo, dlu_up,
        dsx_lo, dsx_up, dlx_lo, dlx_up, ap, ad, comp4, res2,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "diag6_stage", "diag6_term", "rdiag_stage", "interpret",
        "with_hold",
    ),
)
def riccati_sweep_sparse(
    hq, gx, gu, a, b, bc, r, zx, zu, sig_u, sig_x, corr_u, corr_x, dx0_res,
    clip_lo=None, clip_hi=None,
    *, h, diag6_stage, diag6_term, rdiag_stage, interpret: bool = False,
    with_hold: bool = False,
):
    """One fused backward+forward sweep in sparse packed layout.

    Shapes (tail = (nb, 8, 128)): hq (N+1,10), gx (N+1,10), gu (N,4),
    a (N,40), b (N,30), bc (N,6), r (N,10), zx (N+1,10), zu (N,4), sig_u (N,4),
    sig_x (N+1,3), corr_u (N,4), corr_x (N+1,3), dx0_res (1,10),
    clip_lo/hi (N,4) or None.

    Computes the Newton direction of the equality-constrained LQR at iterate
    (zx, zu) with gradients ghat = g + H z + corr and defects
    rhat = A zx + B zu + r - zx' assembled in-kernel.

    Returns (dx (N+1,10,tail), du (N,4,tail), rhat (N,10,tail)); with
    `with_hold=True` also the zero-control rollout dx_hold (N+1,10,tail) —
    ONLY valid when called at the zero iterate (zx = zu = 0, so the
    in-kernel rhat equals r); used by the warm-start call to get the
    far-regime feasible start for free.
    """
    Np1, _, nb = hq.shape[:3]
    N = Np1 - 1
    dt = gx.dtype  # compute dtype; hq/a/b may be stored narrower (bf16)
    nbt = _nbt_for(nb)
    grid = (nb // nbt, N)

    consts = dict(
        h=h, diag6_stage=diag6_stage, diag6_term=diag6_term,
        rdiag_stage=rdiag_stage,
    )
    out_shape_b = (
        jax.ShapeDtypeStruct((N, NU * NX, nb, SUB, LANE), dt),
        jax.ShapeDtypeStruct((N, NU, nb, SUB, LANE), dt),
        jax.ShapeDtypeStruct((N, NX, nb, SUB, LANE), dt),
    )
    K, kf, rhat = pl.pallas_call(
        functools.partial(_backward_kernel, **consts),
        grid=grid,
        in_specs=[
            _stage_spec(16, True, N, nbt),  # hq (stages 0..N-1)
            _stage_spec(NX, True, N, nbt),  # gx
            _stage_spec(NU, True, N, nbt),  # gu
            _stage_spec(40, True, N, nbt),  # a
            _stage_spec(30, True, N, nbt),  # b omega cols
            _stage_spec(6, True, N, nbt),  # bc collective cols
            _stage_spec(NX, True, N, nbt),  # r
            _stage_spec(NX, True, N, nbt),  # zx at s
            _stage_spec(NX, True, N, nbt, shift=1),  # zx at s+1
            _stage_spec(NU, True, N, nbt),  # zu
            _stage_spec(NU, True, N, nbt),  # sig_u
            _stage_spec(3, True, N, nbt),  # sig_x
            _stage_spec(NU, True, N, nbt),  # corr_u
            _stage_spec(3, True, N, nbt),  # corr_x
            _pinned_spec(16, N, nbt),  # hq terminal
            _pinned_spec(NX, N, nbt),  # gx terminal
            _pinned_spec(NX, N, nbt),  # zx terminal
            _pinned_spec(3, N, nbt),  # sig_x terminal
            _pinned_spec(3, N, nbt),  # corr_x terminal
        ],
        out_specs=[
            _stage_spec(NU * NX, True, N, nbt),
            _stage_spec(NU, True, N, nbt),
            _stage_spec(NX, True, N, nbt),
        ],
        out_shape=out_shape_b,
        scratch_shapes=[
            pltpu.VMEM((NX * NX, nbt, SUB, LANE), dt),
            pltpu.VMEM((NX, nbt, SUB, LANE), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        hq, gx, gu, a, b, bc, r, zx, zx, zu, sig_u, sig_x, corr_u, corr_x,
        hq, gx, zx, sig_x, corr_x,
    )

    clip = clip_lo is not None
    if not clip:
        clip_lo = jnp.zeros((N, NU, nb, SUB, LANE), dt)
        clip_hi = clip_lo
    out_shape_f = [
        jax.ShapeDtypeStruct((N, NX, nb, SUB, LANE), dt),
        jax.ShapeDtypeStruct((N, NU, nb, SUB, LANE), dt),
        jax.ShapeDtypeStruct((1, NX, nb, SUB, LANE), dt),
    ]
    out_specs_f = [
        _stage_spec(NX, False, N, nbt),
        _stage_spec(NU, False, N, nbt),
        _pinned_spec(NX, 0, nbt),
    ]
    scratch_f = [pltpu.VMEM((NX, nbt, SUB, LANE), dt)]
    if with_hold:
        out_shape_f += [
            jax.ShapeDtypeStruct((N, NX, nb, SUB, LANE), dt),
            jax.ShapeDtypeStruct((1, NX, nb, SUB, LANE), dt),
        ]
        out_specs_f += [
            _stage_spec(NX, False, N, nbt),
            _pinned_spec(NX, 0, nbt),
        ]
        scratch_f += [pltpu.VMEM((NX, nbt, SUB, LANE), dt)]
    outs = pl.pallas_call(
        functools.partial(
            _forward_kernel, h=h, n_stages=N, clip=clip, hold=with_hold
        ),
        grid=grid,
        in_specs=[
            _stage_spec(40, False, N, nbt),  # a
            _stage_spec(30, False, N, nbt),  # b omega cols
            _stage_spec(6, False, N, nbt),  # bc collective cols
            _stage_spec(NX, False, N, nbt),  # rhat
            _stage_spec(NU * NX, False, N, nbt),  # K
            _stage_spec(NU, False, N, nbt),  # k
            _stage_spec(NU, False, N, nbt),  # lo
            _stage_spec(NU, False, N, nbt),  # hi
            _pinned_spec(NX, 0, nbt),  # dx0
        ],
        out_specs=out_specs_f,
        out_shape=tuple(out_shape_f),
        scratch_shapes=scratch_f,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(a, b, bc, rhat, K, kf, clip_lo, clip_hi, dx0_res)

    dx019, du, dxN = outs[0], outs[1], outs[2]
    dx = jnp.concatenate([dx019, dxN], axis=0)
    if with_hold:
        dx_hold = jnp.concatenate([outs[3], outs[4]], axis=0)
        return dx, du, rhat, dx_hold
    return dx, du, rhat
