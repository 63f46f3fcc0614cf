"""Whole-solve interior-point kernel: the ENTIRE fixed-iteration IPM in ONE
Pallas launch, with every stage payload resident in VMEM across iterations.

Why: the per-iteration kernels (`riccati_sparse.riccati_iter_fused`) re-stream
the ~116-float/stage payload (hq/gx/gu/a/b/bc/r + bounds + iterate state) from
HBM on every one of the 6-12 IPM iterations — measured HBM-bound, that re-read
is the dominant removable traffic of the solve (VERDICT r2 item 1). This
kernel reads the payload ONCE per batch block, keeps it in VMEM, and runs the
full interior-point loop in-kernel: zero-control feasible start, slack
initialization, dual warm-start mixing (cold-sentinel aware), then
`num_iters` x (backward Riccati sweep -> forward rollout -> fraction-to-
boundary -> primal/dual update -> barrier update). Per-solve HBM traffic
drops from O(num_iters * payload) to O(payload).

The batch sits on the (8, 128) vector lanes exactly as in `riccati_sparse.py`
(one grid step per 1024-scenario block; every matrix element is a full VPU
tile), the stage recursions run as in-kernel `fori_loop`s over stage-indexed
VMEM scratch, and the per-stage math is shared with the two-kernel path
(`_riccati_stage_core`, `_glue_pair`, `_bound_steps`, `_dyn_step`) so the
algorithms cannot drift. Parity vs `ipm_sparse(fuse_glue=True,
lqr_start=False)` is asserted element-level in `tests/test_ipm_whole.py`.

Semantics: identical to `solver/qp_ipm_sparse.ipm_sparse` with
`lqr_start=False` (the zero-control dynamics-exact start — the validated
equal-accuracy configuration for the dual-warm-started production path, see
the long note there) and the res2-based equality residual. The reference role
matched is the HPIPM solve at `nmpc_ctl/nmpc_body_rate_ctl.py:71-80`.

VMEM budget per SUB*128-lane block (f32 at SUB=8, 4 KB/tile): payload ~2.9k tiles in +
~0.6k out (double-buffered by the pipeline) + ~1.8k scratch (K/kf, rhat,
slacks, direction store, P) ~= 35 MB total.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .riccati import LANE, SUB
from .riccati_sparse import (
    NU,
    NX,
    _bound_steps,
    _dyn_step,
    _glue_pair,
    _riccati_stage_core,
    _terminal_init_core,
)


def _slack_init_pair(lo, hi, v, s_min):
    """Tile version of `solver/qp_ipm.ipm_slack_init` for one bound row."""
    rng = hi - lo
    floor = jnp.minimum(s_min * jnp.minimum(rng, 1e3), 0.5 * rng)
    return (
        jnp.maximum(jnp.abs(v - lo), floor),
        jnp.maximum(jnp.abs(hi - v), floor),
    )


def _load_blocks_at(a_ref, b_ref, bc_ref, k, dt):
    """Sparse A/B payload tiles at stage k (dynamic), cast to compute dtype.

    Same unpacking as `riccati_sparse._load_blocks`, but indexed into the
    whole-horizon VMEM block instead of a per-stage pipeline block."""
    A = lambda j: a_ref[k, j, 0].astype(dt)
    Bw = lambda j: b_ref[k, j, 0].astype(dt)
    C = lambda j: bc_ref[k, j, 0].astype(dt)
    apq = [[A(i * 4 + j) for j in range(4)] for i in range(3)]
    avq = [[A(12 + i * 4 + j) for j in range(4)] for i in range(3)]
    aqq = [[A(24 + i * 4 + j) for j in range(4)] for i in range(4)]
    bp = [[Bw(i * 3 + l) for l in range(3)] + [C(i)] for i in range(3)]
    bv = [[Bw(9 + i * 3 + l) for l in range(3)] + [C(3 + i)] for i in range(3)]
    bq = [[Bw(18 + i * 3 + l) for l in range(3)] for i in range(4)]
    return apq, avq, aqq, bp, bv, bq


def _ipm_whole_kernel(
    hq_ref, gx_ref, gu_ref, a_ref, b_ref, bc_ref, r_ref,
    lub_ref, uub_ref, lxb_ref, uxb_ref,
    wlul_ref, wluu_ref, wlxl_ref, wlxu_ref, wmu_ref, dx0_ref,
    zx_o, zu_o, lul_o, luu_o, lxl_o, lxu_o, mu_o, eq_o,
    P_scr, p_scr, K_scr, kf_scr, rh_scr,
    sul_scr, suu_scr, sxl_scr, sxu_scr, dx_scr, du_scr,
    *, h, diag6_stage, diag6_term, rdiag_stage,
    tau, sigma, mu0, s_min, mu_min, num_iters, n_stages,
    xb_ref=None, ub_ref=None,
):
    N = n_stages
    dt = gx_ref.dtype

    def t(ref, k, j):
        return ref[k, j, 0]

    mu_w = wmu_ref[0, 0, 0]
    cold = mu_w < 0.0
    n_cons = 2 * N * NU + 2 * (N + 1) * 3
    dx0 = [dx0_ref[0, i, 0] for i in range(NX)]

    def mix_lam(carried, s):
        # dual warm start with per-lane cold-sentinel fallback
        # (mirrors qp_ipm_sparse.ipm_sparse warm mixing)
        return jnp.where(cold, mu0 / s, jnp.maximum(carried, 1e-12))

    def init_x_node(k, z, c0):
        """Slack init + dual mixing for the velocity-box rows of node k."""
        for i in range(3):
            lo, hi = t(lxb_ref, k, i), t(uxb_ref, k, i)
            s_lo, s_up = _slack_init_pair(lo, hi, z[3 + i], s_min)
            sxl_scr[k, i] = s_lo
            sxu_scr[k, i] = s_up
            ll = mix_lam(t(wlxl_ref, k, i), s_lo)
            lu = mix_lam(t(wlxu_ref, k, i), s_up)
            lxl_o[k, i, 0] = ll
            lxu_o[k, i, 0] = lu
            c0 = c0 + s_lo * ll + s_up * lu
        return c0

    # ---- init: zero-control dynamics-exact rollout (the far-regime
    # feasible start, `qp_ipm.solve_qp`), slack init at the zero iterate,
    # dual warm mixing, comp-derived barrier start ----
    def init_body(k, carry):
        z = list(carry[:NX])
        c0 = carry[NX]
        zero = jnp.zeros_like(z[0])
        for l in range(NU):
            lo, hi = t(lub_ref, k, l), t(uub_ref, k, l)
            s_lo, s_up = _slack_init_pair(lo, hi, zero, s_min)
            sul_scr[k, l] = s_lo
            suu_scr[k, l] = s_up
            ll = mix_lam(t(wlul_ref, k, l), s_lo)
            lu = mix_lam(t(wluu_ref, k, l), s_up)
            lul_o[k, l, 0] = ll
            luu_o[k, l, 0] = lu
            c0 = c0 + s_lo * ll + s_up * lu
            zu_o[k, l, 0] = zero
        for i in range(NX):
            zx_o[k, i, 0] = z[i]
        c0 = init_x_node(k, z, c0)
        apq, avq, aqq, bp, bv, bq = _load_blocks_at(a_ref, b_ref, bc_ref, k, dt)
        rk = [t(r_ref, k, i) for i in range(NX)]
        nxt = _dyn_step(apq, avq, aqq, bp, bv, bq, rk, h, z, None)
        return tuple(nxt) + (c0,)

    out = jax.lax.fori_loop(
        0, N, init_body, tuple(dx0) + (jnp.zeros_like(dx0[0]),)
    )
    zT = list(out[:NX])
    for i in range(NX):
        zx_o[N, i, 0] = zT[i]
    c0 = init_x_node(N, zT, out[NX])
    mu_start = jnp.where(
        cold, jnp.full_like(mu_w, mu0),
        jnp.clip(sigma * c0 / n_cons, mu_min, mu0),
    )

    # ---- the interior-point loop, entirely in VMEM ----
    def iter_body(_, carry):
        mu = carry[0]

        # backward Riccati sweep (stages N-1..0), K/kf/rhat into scratch
        zxT = [zx_o[N, i, 0] for i in range(NX)]
        sigT, corrT = [], []
        for i in range(3):
            sg, co, *_ = _glue_pair(
                zxT[3 + i], t(lxb_ref, N, i), t(uxb_ref, N, i),
                sxl_scr[N, i], sxu_scr[N, i],
                lxl_o[N, i, 0], lxu_o[N, i, 0], mu,
            )
            sigT.append(sg)
            corrT.append(co)
        hqT = [t(hq_ref, N, j).astype(dt) for j in range(16)]
        gxT = [t(gx_ref, N, i) for i in range(NX)]
        _terminal_init_core(
            P_scr, p_scr, hqT, gxT, zxT, sigT, corrT, diag6_term=diag6_term
        )

        def bwd_body(rs, r2):
            k = N - 1 - rs
            P = [[P_scr[i * NX + j] for j in range(NX)] for i in range(NX)]
            p = [p_scr[i] for i in range(NX)]
            Hq = [
                [t(hq_ref, k, i * 4 + j).astype(dt) for j in range(4)]
                for i in range(4)
            ]
            gx = [t(gx_ref, k, i) for i in range(NX)]
            gu = [t(gu_ref, k, l) for l in range(NU)]
            apq, avq, aqq, bp, bv, bq = _load_blocks_at(
                a_ref, b_ref, bc_ref, k, dt
            )
            rk = [t(r_ref, k, i) for i in range(NX)]
            zx = [zx_o[k, i, 0] for i in range(NX)]
            zx1 = [zx_o[k + 1, i, 0] for i in range(NX)]
            zu = [zu_o[k, l, 0] for l in range(NU)]
            sig_u, corr_u = [], []
            for l in range(NU):
                sg, co, *_ = _glue_pair(
                    zu[l], t(lub_ref, k, l), t(uub_ref, k, l),
                    sul_scr[k, l], suu_scr[k, l],
                    lul_o[k, l, 0], luu_o[k, l, 0], mu,
                )
                sig_u.append(sg)
                corr_u.append(co)
            sig_x, corr_x = [], []
            for i in range(3):
                sg, co, *_ = _glue_pair(
                    zx[3 + i], t(lxb_ref, k, i), t(uxb_ref, k, i),
                    sxl_scr[k, i], sxu_scr[k, i],
                    lxl_o[k, i, 0], lxu_o[k, i, 0], mu,
                )
                sig_x.append(sg)
                corr_x.append(co)
            K, kf, rh = _riccati_stage_core(
                P, p, P_scr, p_scr, Hq, gx, gu, apq, avq, aqq, bp, bv, bq,
                rk, zx, zx1, zu, sig_u, sig_x, corr_u, corr_x,
                h=h, diag6_stage=diag6_stage, rdiag_stage=rdiag_stage,
            )
            for l in range(NU):
                for j in range(NX):
                    K_scr[k, l * NX + j] = K[l][j]
                kf_scr[k, l] = kf[l]
            for i in range(NX):
                rh_scr[k, i] = rh[i]
            return r2 + sum(rh[i] * rh[i] for i in range(NX))

        r2 = jax.lax.fori_loop(0, N, bwd_body, jnp.zeros_like(mu))
        dx0_res = [dx0[i] - zx_o[0, i, 0] for i in range(NX)]
        r2 = r2 + sum(v * v for v in dx0_res)

        # forward rollout + fraction-to-boundary + complementarity partials
        # (directions stored; slack/dual directions recovered again in the
        # update pass — cheap elementwise vs storing 8 more stage arrays)
        two = jnp.full_like(mu, 2.0)
        zero = jnp.zeros_like(mu)

        def fwdA_body(k, carry):
            dx = list(carry[:NX])
            ap, ad, c1, c2, c3, c4 = carry[NX:]
            K = [[K_scr[k, l * NX + j] for j in range(NX)] for l in range(NU)]
            du = [
                sum(K[l][j] * dx[j] for j in range(NX)) + kf_scr[k, l]
                for l in range(NU)
            ]
            for i in range(NX):
                dx_scr[k, i] = dx[i]
            for l in range(NU):
                du_scr[k, l] = du[l]
            for l in range(NU):
                s_lo, s_up = sul_scr[k, l], suu_scr[k, l]
                l_lo, l_up = lul_o[k, l, 0], luu_o[k, l, 0]
                _, _, r_lo, r_up, rc_lo, rc_up = _glue_pair(
                    zu_o[k, l, 0], t(lub_ref, k, l), t(uub_ref, k, l),
                    s_lo, s_up, l_lo, l_up, mu,
                )
                ds_lo, ds_up, dl_lo, dl_up, ap_l, ad_l = _bound_steps(
                    du[l], r_lo, r_up, rc_lo, rc_up, s_lo, s_up, l_lo, l_up,
                    tau,
                )
                ap = jnp.minimum(ap, ap_l)
                ad = jnp.minimum(ad, ad_l)
                c1 = c1 + s_lo * l_lo + s_up * l_up
                c2 = c2 + ds_lo * l_lo + ds_up * l_up
                c3 = c3 + s_lo * dl_lo + s_up * dl_up
                c4 = c4 + ds_lo * dl_lo + ds_up * dl_up
            for i in range(3):
                s_lo, s_up = sxl_scr[k, i], sxu_scr[k, i]
                l_lo, l_up = lxl_o[k, i, 0], lxu_o[k, i, 0]
                _, _, r_lo, r_up, rc_lo, rc_up = _glue_pair(
                    zx_o[k, 3 + i, 0], t(lxb_ref, k, i), t(uxb_ref, k, i),
                    s_lo, s_up, l_lo, l_up, mu,
                )
                ds_lo, ds_up, dl_lo, dl_up, ap_i, ad_i = _bound_steps(
                    dx[3 + i], r_lo, r_up, rc_lo, rc_up, s_lo, s_up,
                    l_lo, l_up, tau,
                )
                ap = jnp.minimum(ap, ap_i)
                ad = jnp.minimum(ad, ad_i)
                c1 = c1 + s_lo * l_lo + s_up * l_up
                c2 = c2 + ds_lo * l_lo + ds_up * l_up
                c3 = c3 + s_lo * dl_lo + s_up * dl_up
                c4 = c4 + ds_lo * dl_lo + ds_up * dl_up
            apq, avq, aqq, bp, bv, bq = _load_blocks_at(
                a_ref, b_ref, bc_ref, k, dt
            )
            rh = [rh_scr[k, i] for i in range(NX)]
            nxt = _dyn_step(apq, avq, aqq, bp, bv, bq, rh, h, dx, du)
            return tuple(nxt) + (ap, ad, c1, c2, c3, c4)

        outA = jax.lax.fori_loop(
            0, N, fwdA_body,
            tuple(dx0_res) + (two, two, zero, zero, zero, zero),
        )
        dxT = list(outA[:NX])
        ap, ad, c1, c2, c3, c4 = outA[NX:]
        for i in range(NX):
            dx_scr[N, i] = dxT[i]
        for i in range(3):
            s_lo, s_up = sxl_scr[N, i], sxu_scr[N, i]
            l_lo, l_up = lxl_o[N, i, 0], lxu_o[N, i, 0]
            _, _, r_lo, r_up, rc_lo, rc_up = _glue_pair(
                zx_o[N, 3 + i, 0], t(lxb_ref, N, i), t(uxb_ref, N, i),
                s_lo, s_up, l_lo, l_up, mu,
            )
            ds_lo, ds_up, dl_lo, dl_up, ap_i, ad_i = _bound_steps(
                dxT[3 + i], r_lo, r_up, rc_lo, rc_up, s_lo, s_up, l_lo, l_up,
                tau,
            )
            ap = jnp.minimum(ap, ap_i)
            ad = jnp.minimum(ad, ad_i)
            c1 = c1 + s_lo * l_lo + s_up * l_up
            c2 = c2 + ds_lo * l_lo + ds_up * l_up
            c3 = c3 + s_lo * dl_lo + s_up * dl_up
            c4 = c4 + ds_lo * dl_lo + ds_up * dl_up
        ap = jnp.minimum(ap, 1.0)
        ad = jnp.minimum(ad, 1.0)

        # update pass: recover slack/dual directions from the stored primal
        # directions (same formulas, same inputs as pass A -> identical
        # values) and apply the step in place
        def upd_x_node(k):
            for i in range(3):
                s_lo, s_up = sxl_scr[k, i], sxu_scr[k, i]
                l_lo, l_up = lxl_o[k, i, 0], lxu_o[k, i, 0]
                _, _, r_lo, r_up, rc_lo, rc_up = _glue_pair(
                    zx_o[k, 3 + i, 0], t(lxb_ref, k, i), t(uxb_ref, k, i),
                    s_lo, s_up, l_lo, l_up, mu,
                )
                d = dx_scr[k, 3 + i]
                ds_lo = d + r_lo
                ds_up = -d + r_up
                sxl_scr[k, i] = s_lo + ap * ds_lo
                sxu_scr[k, i] = s_up + ap * ds_up
                lxl_o[k, i, 0] = l_lo + ad * (
                    -(rc_lo + l_lo * ds_lo) / s_lo
                )
                lxu_o[k, i, 0] = l_up + ad * (
                    -(rc_up + l_up * ds_up) / s_up
                )
            for i in range(NX):
                zx_o[k, i, 0] = zx_o[k, i, 0] + ap * dx_scr[k, i]

        def fwdB_body(k, acc):
            for l in range(NU):
                s_lo, s_up = sul_scr[k, l], suu_scr[k, l]
                l_lo, l_up = lul_o[k, l, 0], luu_o[k, l, 0]
                _, _, r_lo, r_up, rc_lo, rc_up = _glue_pair(
                    zu_o[k, l, 0], t(lub_ref, k, l), t(uub_ref, k, l),
                    s_lo, s_up, l_lo, l_up, mu,
                )
                d = du_scr[k, l]
                ds_lo = d + r_lo
                ds_up = -d + r_up
                sul_scr[k, l] = s_lo + ap * ds_lo
                suu_scr[k, l] = s_up + ap * ds_up
                lul_o[k, l, 0] = l_lo + ad * (
                    -(rc_lo + l_lo * ds_lo) / s_lo
                )
                luu_o[k, l, 0] = l_up + ad * (
                    -(rc_up + l_up * ds_up) / s_up
                )
                zu_o[k, l, 0] = zu_o[k, l, 0] + ap * d
            upd_x_node(k)
            return acc

        jax.lax.fori_loop(0, N, fwdB_body, 0)
        upd_x_node(N)

        comp = (c1 + ap * c2 + ad * c3 + ap * ad * c4) / n_cons
        mu = jnp.maximum(sigma * comp, mu_min)
        return (mu, r2, ap)

    zero = jnp.zeros_like(mu_start)
    mu, res2_l, ap_l = jax.lax.fori_loop(
        0, num_iters, iter_body, (mu_start, zero, zero)
    )
    mu_o[0, 0, 0] = mu
    # defect contracts exactly by (1 - a_p) per iteration (see
    # qp_ipm_sparse.ipm_sparse), so the final equality residual is
    # (1 - a_p_last) * ||(rhat, dx0_res)|| of the last iteration
    eq_o[0, 0, 0] = (1.0 - ap_l) * jnp.sqrt(res2_l)

    if xb_ref is not None:
        # kernel-layout-resident RTI state: fold the SQP axpy in-kernel and
        # emit the UPDATED iterates (x_bar + dx, u_bar + du) instead of the
        # solution delta — the delta never round-trips through HBM and the
        # XLA-side axpy (3x iterate traffic) disappears (VERDICT r3 item 2)
        def fold_body(k, _):
            for i in range(NX):
                zx_o[k, i, 0] = zx_o[k, i, 0] + xb_ref[k, i, 0]

            @pl.when(k < N)
            def _():
                for l in range(NU):
                    zu_o[k, l, 0] = zu_o[k, l, 0] + ub_ref[k, l, 0]

            return 0

        jax.lax.fori_loop(0, N + 1, fold_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "diag6_stage", "diag6_term", "rdiag_stage", "tau", "sigma",
        "mu_init", "s_min", "mu_min", "num_iters", "interpret",
    ),
)
def riccati_ipm_whole(
    hq, gx, gu, a, b, bc, r, lub, uub, lxb, uxb,
    wlu_lo, wlu_up, wlx_lo, wlx_up, wmu, dx0,
    xb=None, ub=None,
    *, h, diag6_stage, diag6_term, rdiag_stage, tau, sigma, mu_init,
    s_min, mu_min, num_iters, interpret: bool = False,
):
    """The whole IPM solve in one kernel launch.

    Shapes as `riccati_sweep_sparse` (tail = (nb, 8, 128)), plus the carried
    dual state wlu/wlx (same layout as `IpmWarm`) and wmu (nb, SUB, 128) with
    the < 0 cold sentinel. Returns (zx (N+1,10,tail), zu (N,4,tail),
    lu_lo, lu_up (N,4,tail), lx_lo, lx_up (N+1,3,tail), mu (tail),
    eq_res (tail)).

    With `xb`/`ub` (the current RTI iterates in kernel layout) the SQP axpy
    is folded in-kernel and the FIRST TWO outputs are the UPDATED iterates
    xb + dx / ub + du instead of the solution delta (kernel-layout-resident
    RtiState, `solver/rti.py packed_state`).
    """
    Np1, _, nb = hq.shape[:3]
    N = Np1 - 1
    dt = gx.dtype
    mu5 = wmu.reshape((1, 1) + wmu.shape)
    fold_xu = xb is not None

    def spec(s, d):
        return pl.BlockSpec(
            (s, d, 1, SUB, LANE),
            lambda i: (0, 0, i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    sd = lambda s, d: jax.ShapeDtypeStruct((s, d, nb, SUB, LANE), dt)
    base = functools.partial(
        _ipm_whole_kernel,
        h=h, diag6_stage=diag6_stage, diag6_term=diag6_term,
        rdiag_stage=rdiag_stage, tau=tau, sigma=sigma, mu0=mu_init,
        s_min=s_min, mu_min=mu_min, num_iters=num_iters, n_stages=N,
    )
    if fold_xu:
        # refs arrive positionally: 17 payload inputs, then xb/ub, then
        # outputs + scratch — reroute the two iterate refs to keywords
        def kernel(*refs):
            return base(*refs[:17], *refs[19:], xb_ref=refs[17], ub_ref=refs[18])
    else:
        kernel = base
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            spec(Np1, 16),  # hq
            spec(Np1, NX),  # gx
            spec(N, NU),  # gu
            spec(N, 40),  # a
            spec(N, 30),  # b omega cols
            spec(N, 6),  # bc collective cols
            spec(N, NX),  # r
            spec(N, NU),  # lu bound
            spec(N, NU),  # uu bound
            spec(Np1, 3),  # lx bound
            spec(Np1, 3),  # ux bound
            spec(N, NU),  # warm lu_lo
            spec(N, NU),  # warm lu_up
            spec(Np1, 3),  # warm lx_lo
            spec(Np1, 3),  # warm lx_up
            spec(1, 1),  # warm mu (cold sentinel < 0)
            spec(1, NX),  # dx0
        ]
        + ([spec(Np1, NX), spec(N, NU)] if fold_xu else []),  # xb, ub
        out_specs=[
            spec(Np1, NX),  # zx
            spec(N, NU),  # zu
            spec(N, NU),  # lu_lo out
            spec(N, NU),  # lu_up out
            spec(Np1, 3),  # lx_lo out
            spec(Np1, 3),  # lx_up out
            spec(1, 1),  # mu out
            spec(1, 1),  # eq_res out
        ],
        out_shape=(
            sd(Np1, NX), sd(N, NU), sd(N, NU), sd(N, NU),
            sd(Np1, 3), sd(Np1, 3), sd(1, 1), sd(1, 1),
        ),
        # Dual state (and, with fold_xu, the RTI iterates) updates in place:
        # block windows match pairwise and each grid step stages its input
        # block to VMEM before writing the output block, so same-index
        # aliasing is hazard-free. Under lax.scan this keeps the carried
        # solver state in one buffer set instead of copying every kernel
        # output into the loop carry (see step_whole.py for the measured
        # effect on the fused path).
        input_output_aliases=(
            {17: 0, 18: 1, 11: 2, 12: 3, 13: 4, 14: 5, 15: 6}
            if fold_xu
            else {11: 2, 12: 3, 13: 4, 14: 5, 15: 6}
        ),
        scratch_shapes=[
            pltpu.VMEM((NX * NX, SUB, LANE), dt),  # P
            pltpu.VMEM((NX, SUB, LANE), dt),  # p
            pltpu.VMEM((N, NU * NX, SUB, LANE), dt),  # K
            pltpu.VMEM((N, NU, SUB, LANE), dt),  # kf
            pltpu.VMEM((N, NX, SUB, LANE), dt),  # rhat
            pltpu.VMEM((N, NU, SUB, LANE), dt),  # su_lo
            pltpu.VMEM((N, NU, SUB, LANE), dt),  # su_up
            pltpu.VMEM((Np1, 3, SUB, LANE), dt),  # sx_lo
            pltpu.VMEM((Np1, 3, SUB, LANE), dt),  # sx_up
            pltpu.VMEM((Np1, NX, SUB, LANE), dt),  # dx directions
            pltpu.VMEM((N, NU, SUB, LANE), dt),  # du directions
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        hq, gx, gu, a, b, bc, r, lub, uub, lxb, uxb,
        wlu_lo, wlu_up, wlx_lo, wlx_up, mu5, dx0,
        *((xb, ub) if fold_xu else ()),
    )
    return outs
