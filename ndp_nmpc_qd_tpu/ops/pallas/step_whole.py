"""Whole CONTROL-STEP kernel: linearization + the entire interior-point
solve + the SQP axpy in ONE persistent-VMEM Pallas launch.

The round-3 whole-IPM kernel (`ipm_whole.py`) still pays one HBM round trip
for the stage payload: the linearization kernel WRITES hq/gx/gu/a/b/bc/r +
bounds (~7 KB/solve) and the IPM kernel READS them back. This kernel removes
that last interior round trip: per batch block it

1. walks the stages once, computing each stage's QP terms with the SAME
   tile code as the standalone linearization (`linearize._lin_stage_terms`)
   and storing them in VMEM scratch (curvature payloads in the jac dtype,
   so the bf16 split-precision numerics are bit-identical to the two-kernel
   path),
2. runs the UNCHANGED whole-IPM body (`ipm_whole._ipm_whole_kernel`) with
   the payload scratch standing in for its HBM input refs (the scratch is
   shaped exactly like the kernel's per-block view), and
3. folds the SQP axpy, emitting the updated RTI iterates.

Per-solve HBM traffic becomes: iterates + per-tick inputs (refs, forecast,
x0) + carried duals in; updated iterates + duals + health out. The QP data
never exists in HBM at all.

Reference roles replaced: the CasADi/acados codegen linearization +
HPIPM solve of `nmpc_ctl/nmpc_body_rate_ctl.py:71-112`, now one fused
device program per control tick.

Parity: `tests/test_packed_state.py` asserts element-level agreement with
the two-kernel packed-state path in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ipm_whole import _ipm_whole_kernel
from .linearize import NU, NX, _lin_stage_terms, _lin_terminal_terms
from .riccati import LANE, SUB


def _step_whole_kernel(
    xb_ref, ub_ref, xr_ref, ur_ref, fd_ref, x0_ref,
    wlul_ref, wluu_ref, wlxl_ref, wlxu_ref, wmu_ref,
    zx_o, zu_o, lul_o, luu_o, lxl_o, lxu_o, mu_o, eq_o,
    hq_s, gx_s, gu_s, a_s, b_s, bc_s, r_s,
    lub_s, uub_s, lxb_s, uxb_s, dx0_s,
    P_scr, p_scr, K_scr, kf_scr, rh_scr,
    sul_scr, suu_scr, sxl_scr, sxu_scr, dx_scr, du_scr,
    *, h, substeps, mass, gravity, stage_scale, q_diag, r_diag,
    u_lo, u_hi, v_lo, v_hi, with_dist, big,
    diag6_stage, diag6_term, rdiag_stage,
    tau, sigma, mu0, s_min, mu_min, num_iters, n_stages,
):
    N = n_stages
    jd = hq_s.dtype

    # ---- phase 1: linearize every stage into VMEM scratch ----
    def lin_body(k, _):
        x = tuple(xb_ref[k, i, 0] for i in range(NX))
        x1 = tuple(xb_ref[k + 1, i, 0] for i in range(NX))
        u = tuple(ub_ref[k, l, 0] for l in range(NU))
        xr = tuple(xr_ref[k, i, 0] for i in range(NX))
        ur = tuple(ur_ref[k, l, 0] for l in range(NU))
        fd = tuple(fd_ref[k, t, 0] for t in range(3)) if with_dist else None
        hq, gx, gu, a40, b30, bc6, r = _lin_stage_terms(
            x, x1, u, xr, ur, fd,
            h=h, substeps=substeps, mass=mass, gravity=gravity,
            stage_scale=stage_scale, q_diag=q_diag, r_diag=r_diag,
        )
        for j in range(16):
            hq_s[k, j, 0] = hq[j].astype(jd)
        for i in range(NX):
            gx_s[k, i, 0] = gx[i]
            r_s[k, i, 0] = r[i]
        for l in range(NU):
            gu_s[k, l, 0] = gu[l]
        for j in range(40):
            a_s[k, j, 0] = a40[j].astype(jd)
        for j in range(30):
            b_s[k, j, 0] = b30[j].astype(jd)
        for j in range(6):
            bc_s[k, j, 0] = bc6[j]
        # bound residuals (u box every stage; v box interior nodes only —
        # rows 0/N get +-big below, matching ocp_sparse/linearize)
        for l in range(NU):
            lub_s[k, l, 0] = u_lo[l] - u[l]
            uub_s[k, l, 0] = u_hi[l] - u[l]
        for t in range(3):
            lxb_s[k, t, 0] = v_lo[t] - x[3 + t]
            uxb_s[k, t, 0] = v_hi[t] - x[3 + t]
        return 0

    jax.lax.fori_loop(0, N, lin_body, 0)

    # terminal GN terms + pinned-state residual + big-rows of the v box
    x1T = tuple(xb_ref[N, i, 0] for i in range(NX))
    xrT = tuple(xr_ref[N, i, 0] for i in range(NX))
    hqT, gxT = _lin_terminal_terms(x1T, xrT, q_diag=q_diag)
    for j in range(16):
        hq_s[N, j, 0] = hqT[j].astype(jd)
    for i in range(NX):
        gx_s[N, i, 0] = gxT[i]
        dx0_s[0, i, 0] = x0_ref[0, i, 0] - xb_ref[0, i, 0]
    bigt = jnp.full_like(gx_s[0, 0, 0], big)
    for t in range(3):
        lxb_s[0, t, 0] = -bigt
        uxb_s[0, t, 0] = bigt
        lxb_s[N, t, 0] = -bigt
        uxb_s[N, t, 0] = bigt

    # ---- phases 2+3: the unchanged whole-IPM body over the scratch
    # payload, with the SQP axpy folded (emits UPDATED iterates) ----
    _ipm_whole_kernel(
        hq_s, gx_s, gu_s, a_s, b_s, bc_s, r_s,
        lub_s, uub_s, lxb_s, uxb_s,
        wlul_ref, wluu_ref, wlxl_ref, wlxu_ref, wmu_ref, dx0_s,
        zx_o, zu_o, lul_o, luu_o, lxl_o, lxu_o, mu_o, eq_o,
        P_scr, p_scr, K_scr, kf_scr, rh_scr,
        sul_scr, suu_scr, sxl_scr, sxu_scr, dx_scr, du_scr,
        h=h, diag6_stage=diag6_stage, diag6_term=diag6_term,
        rdiag_stage=rdiag_stage, tau=tau, sigma=sigma, mu0=mu0,
        s_min=s_min, mu_min=mu_min, num_iters=num_iters, n_stages=N,
        xb_ref=xb_ref, ub_ref=ub_ref,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "substeps", "mass", "gravity", "stage_scale", "q_diag",
        "r_diag", "u_lo", "u_hi", "v_lo", "v_hi", "with_dist", "big",
        "diag6_stage", "diag6_term", "rdiag_stage", "tau", "sigma",
        "mu_init", "s_min", "mu_min", "num_iters", "jac_dtype", "interpret",
    ),
)
def control_step_whole(
    xb, ub, xr, ur, fd, x0,
    wlu_lo, wlu_up, wlx_lo, wlx_up, wmu,
    *, h, substeps, mass, gravity, stage_scale, q_diag, r_diag,
    u_lo, u_hi, v_lo, v_hi, with_dist, big,
    diag6_stage, diag6_term, rdiag_stage,
    tau, sigma, mu_init, s_min, mu_min, num_iters,
    jac_dtype=None, interpret: bool = False,
):
    """One fused control step per SUB*128-lane block.

    All array inputs in packed kernel layout (tail = (nb, SUB, 128)):
    xb (N+1, 10, tail), ub (N, 4, tail) — the RTI iterates; xr/ur the tick's
    references; fd (N+1, 3, tail) the downwash forecast; x0 (1, 10, tail);
    wl*/wmu the carried duals (cold sentinel wmu < 0).

    Returns (xb_new, ub_new, lu_lo, lu_up, lx_lo, lx_up, mu (tail),
    eq_res (tail)) — the UPDATED iterates (axpy folded in-kernel).
    """
    Np1, _, nb = xb.shape[:3]
    N = Np1 - 1
    dt = xb.dtype
    jd = jac_dtype or dt
    mu5 = wmu.reshape((1, 1) + wmu.shape)

    def spec(s, d):
        return pl.BlockSpec(
            (s, d, 1, SUB, LANE),
            lambda i: (0, 0, i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    sd = lambda s, d: jax.ShapeDtypeStruct((s, d, nb, SUB, LANE), dt)
    scr = lambda s, d, dtype=dt: pltpu.VMEM((s, d, 1, SUB, LANE), dtype)
    kernel = functools.partial(
        _step_whole_kernel,
        h=h, substeps=substeps, mass=mass, gravity=gravity,
        stage_scale=stage_scale, q_diag=q_diag, r_diag=r_diag,
        u_lo=u_lo, u_hi=u_hi, v_lo=v_lo, v_hi=v_hi,
        with_dist=with_dist, big=big,
        diag6_stage=diag6_stage, diag6_term=diag6_term,
        rdiag_stage=rdiag_stage, tau=tau, sigma=sigma, mu0=mu_init,
        s_min=s_min, mu_min=mu_min, num_iters=num_iters, n_stages=N,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            spec(Np1, NX),  # xb
            spec(N, NU),  # ub
            spec(Np1, NX),  # xr
            spec(N, NU),  # ur
            spec(Np1, 3),  # fd
            spec(1, NX),  # x0
            spec(N, NU),  # warm lu_lo
            spec(N, NU),  # warm lu_up
            spec(Np1, 3),  # warm lx_lo
            spec(Np1, 3),  # warm lx_up
            spec(1, 1),  # warm mu
        ],
        out_specs=[
            spec(Np1, NX),  # xb_new
            spec(N, NU),  # ub_new
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
        # The RTI state tensors (iterates + carried duals) update IN PLACE:
        # each input's block window matches its output's exactly, and a grid
        # step stages its input block into VMEM before the output block is
        # written back, so same-index aliasing is hazard-free. Under
        # `lax.scan` (episodes, the multi-tick bench row) this lets XLA keep
        # the loop-carried RtiState in one buffer set instead of copying
        # ~150 MB/tick of kernel outputs into the carry slots (measured 8%
        # of device time at B=65536 before aliasing).
        input_output_aliases={
            0: 0,  # xb -> xb_new
            1: 1,  # ub -> ub_new
            6: 2,  # warm lu_lo -> lu_lo out
            7: 3,  # warm lu_up -> lu_up out
            8: 4,  # warm lx_lo -> lx_lo out
            9: 5,  # warm lx_up -> lx_up out
            10: 6,  # warm mu -> mu out
        },
        scratch_shapes=[
            # payload scratch (the HBM tensors of the two-kernel path)
            scr(Np1, 16, jd),  # hq
            scr(Np1, NX),  # gx
            scr(N, NU),  # gu
            scr(N, 40, jd),  # a
            scr(N, 30, jd),  # b
            scr(N, 6),  # bc
            scr(N, NX),  # r
            scr(N, NU),  # lu bound
            scr(N, NU),  # uu bound
            scr(Np1, 3),  # lx bound
            scr(Np1, 3),  # ux bound
            scr(1, NX),  # dx0
            # IPM scratch (as ipm_whole)
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
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xb, ub, xr, ur, fd, x0, wlu_lo, wlu_up, wlx_lo, wlx_up, mu5)
    return outs
