"""Pallas TPU kernels: batched Riccati sweeps in batch-on-lanes layout.

Why: the scan-based Riccati in `solver/qp_ipm.py` operates on (B, 10, 10)
arrays — XLA lays the trailing 10 on the 128-wide vector lanes, wasting 92%
of the VPU, and each of the ~40 sequential stages round-trips HBM. Measured
cost: ~26 ms per sweep at B=2048 on v5e (the whole 18-iteration IPM ~475 ms).

The kernel layout inverts this: every matrix ELEMENT (i,j) is a full
(8, 128) tile over a 1024-scenario batch block — arrays are stored as
(stage, element, nb, 8, 128) with batch split into nb blocks of 8x128. Every
multiply-add in the 10x10 recursions then runs at full VPU width. The stage
recursion rides the (sequential) TPU grid: grid = (nb, N_stages) with the
cost-to-go P carried in VMEM scratch across grid steps, and Pallas's
automatic block pipelining streams each stage's QP data HBM->VMEM behind the
compute.

Two kernels per sweep:
- backward: stages N-1..0 (reversed via the index maps), consuming the
  terminal-stage blocks pinned by constant index maps, producing per-stage
  feedback gains K, k.
- forward: stages 0..N-1, rolling the state delta out through (A, B, r) with
  optional control clipping (the clipped-LQR warm start of `solve_qp`).

The math mirrors `qp_ipm.riccati_solve` exactly (same recursions, 4x4
Cholesky solve for the control block); `tests/test_pallas_riccati.py` checks
element-level agreement in interpret mode on CPU.

Assumption baked in: the Hessian has NO state-control cross term (Hxu == 0),
which holds exactly for this OCP — the LS residual's state rows do not
depend on u and vice versa with a diagonal W (`solver/ocp.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX = 10
NU = 4
# Sublanes per batch block: every matrix element is a (SUB, 128) tile over a
# SUB*128-scenario block. The native VPU tile is (8, 128); SUB = 16/32 packs
# 2/4 native tiles of INDEPENDENT scenarios into each elementwise op, hiding
# the sequential stage recursions' dependency latency (the whole-IPM kernel
# measures ~3x above its FLOP estimate at SUB=8 — latency-bound). Costs
# SUB/8 x the VMEM per grid step; QD_TPU_SUB env overrides for experiments.
import os as _os

SUB = int(_os.environ.get("QD_TPU_SUB", "8"))
LANE = 128  # lanes per batch block
BLOCK = SUB * LANE  # scenarios per batch block


def pack(x: jnp.ndarray) -> jnp.ndarray:
    """(B, s, d...) -> (s, prod(d), B//BLOCK, 8, 128), batch-last-split.

    B must be a multiple of BLOCK (pad upstream).
    """
    B = x.shape[0]
    assert B % BLOCK == 0, B
    s = x.shape[1]
    d = 1
    for t in x.shape[2:]:
        d *= t
    x = x.reshape(B, s, d)
    x = jnp.moveaxis(x, 0, -1)  # (s, d, B)
    return x.reshape(s, d, B // BLOCK, SUB, LANE)


def unpack(x: jnp.ndarray, trailing: tuple) -> jnp.ndarray:
    """Inverse of pack: (s, d, nb, 8, 128) -> (B, s, *trailing)."""
    s, d = x.shape[0], x.shape[1]
    B = x.shape[2] * BLOCK
    x = x.reshape(s, d, B)
    x = jnp.moveaxis(x, -1, 0)
    return x.reshape((B, s) + trailing)


def _mat(ref, n, m):
    """Load an (n*m)-element packed block as a Python list-of-lists of
    (8,128) tiles: M[i][j]."""
    return [[ref[0, i * m + j, 0] for j in range(m)] for i in range(n)]


def _vec(ref, n):
    return [ref[0, i, 0] for i in range(n)]


def _matmul(AT, Bm, n, m, k):
    """C[i][j] = sum_l A[l][i] * B[l][j] — i.e. A^T @ B with A given as
    list-of-lists A[l][i] (l = contraction dim). Returns n x m lists."""
    return [
        [sum(AT[l][i] * Bm[l][j] for l in range(k)) for j in range(m)]
        for i in range(n)
    ]


def _chol4(R):
    """Cholesky of a 4x4 SPD matrix of (8,128) tiles; returns (lower L,
    reciprocal diagonal). Divisions are the slow VPU op here — one
    reciprocal per pivot replaces the per-element divides in the factor AND
    in every `_chol4_solve` substitution (14 columns x 8 divides/stage in
    the Riccati sweep become multiplies)."""
    L = [[None] * 4 for _ in range(4)]
    Ld = [None] * 4
    for i in range(4):
        for j in range(i + 1):
            s = R[i][j]
            for t in range(j):
                s = s - L[i][t] * L[j][t]
            if i == j:
                L[i][j] = jnp.sqrt(s)
                Ld[i] = 1.0 / L[i][j]
            else:
                L[i][j] = s * Ld[j]
    return L, Ld


def _chol4_solve(L_Ld, rhs_cols):
    """Solve (L L^T) X = rhs for each column (list of 4 tiles)."""
    L, Ld = L_Ld
    out = []
    for col in rhs_cols:
        y = [None] * 4
        for i in range(4):
            s = col[i]
            for t in range(i):
                s = s - L[i][t] * y[t]
            y[i] = s * Ld[i]
        x = [None] * 4
        for i in reversed(range(4)):
            s = y[i]
            for t in range(i + 1, 4):
                s = s - L[t][i] * x[t]
            x[i] = s * Ld[i]
        out.append(x)
    return out


def _backward_kernel(
    hxx_ref, sxd_ref, huu_ref, sud_ref, gx_ref, gu_ref, a_ref, b_ref, r_ref,
    hxxT_ref, sxdT_ref, gxT_ref,
    K_out, k_out,
    P_scr, p_scr,
):
    s_rev = pl.program_id(1)

    @pl.when(s_rev == 0)
    def _():
        # terminal cost-to-go: P = Hxx_N + diag(sig_N), p = ghat_N
        for i in range(NX):
            for j in range(NX):
                P_scr[i * NX + j] = hxxT_ref[0, i * NX + j, 0]
            P_scr[i * NX + i] = P_scr[i * NX + i] + sxdT_ref[0, i, 0]
            p_scr[i] = gxT_ref[0, i, 0]

    P = [[P_scr[i * NX + j] for j in range(NX)] for i in range(NX)]
    p = [p_scr[i] for i in range(NX)]

    A = _mat(a_ref, NX, NX)
    Bm = _mat(b_ref, NX, NU)
    Hxx = _mat(hxx_ref, NX, NX)
    Huu = _mat(huu_ref, NU, NU)
    gx = _vec(gx_ref, NX)
    gu = _vec(gu_ref, NU)
    r = _vec(r_ref, NX)
    sxd = _vec(sxd_ref, NX)
    sud = _vec(sud_ref, NU)

    # Pr_p = P r + p
    Prp = [sum(P[i][j] * r[j] for j in range(NX)) + p[i] for i in range(NX)]
    # PA = P @ A ; PB = P @ B   (P in row-major lists: P[i][j])
    PA = [
        [sum(P[i][j] * A[j][k] for j in range(NX)) for k in range(NX)]
        for i in range(NX)
    ]
    PB = [
        [sum(P[i][j] * Bm[j][l] for j in range(NX)) for l in range(NU)]
        for i in range(NX)
    ]
    # Qh = Hxx + sig_x_diag + A^T PA
    Qh = _matmul(A, PA, NX, NX, NX)
    for i in range(NX):
        for j in range(NX):
            Qh[i][j] = Qh[i][j] + Hxx[i][j]
        Qh[i][i] = Qh[i][i] + sxd[i]
    # S = B^T PA  (NU x NX); Rh = Huu + sig_u + B^T PB
    S = _matmul(Bm, PA, NU, NX, NX)
    Rh = _matmul(Bm, PB, NU, NU, NX)
    for l in range(NU):
        for m in range(NU):
            Rh[l][m] = Rh[l][m] + Huu[l][m]
        Rh[l][l] = Rh[l][l] + sud[l]
    # qv = ghat_x + A^T Prp ; rv = ghat_u + B^T Prp
    qv = [gx[i] + sum(A[j][i] * Prp[j] for j in range(NX)) for i in range(NX)]
    rv = [gu[l] + sum(Bm[j][l] * Prp[j] for j in range(NX)) for l in range(NU)]

    L = _chol4(Rh)
    # columns: S columns (k = 0..9) then rv
    cols = [[S[l][k] for l in range(NU)] for k in range(NX)] + [rv]
    sols = _chol4_solve(L, cols)
    K = [[-sols[k][l] for k in range(NX)] for l in range(NU)]  # K[l][k]
    kf = [-sols[NX][l] for l in range(NU)]

    # P_new = Qh + S^T K (symmetrized); p_new = qv + S^T k
    Pn = [
        [Qh[i][j] + sum(S[l][i] * K[l][j] for l in range(NU)) for j in range(NX)]
        for i in range(NX)
    ]
    for i in range(NX):
        for j in range(NX):
            sym = 0.5 * (Pn[i][j] + Pn[j][i])
            P_scr[i * NX + j] = sym
        p_scr[i] = qv[i] + sum(S[l][i] * kf[l] for l in range(NU))

    for l in range(NU):
        for kk in range(NX):
            K_out[0, l * NX + kk, 0] = K[l][kk]
        k_out[0, l, 0] = kf[l]


def _forward_kernel(
    a_ref, b_ref, r_ref, K_ref, k_ref, lo_ref, hi_ref, dx0_ref,
    dx_out, du_out, dxN_out,
    dx_scr,
    *, n_stages, clip,
):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        for i in range(NX):
            dx_scr[i] = dx0_ref[0, i, 0]

    dx = [dx_scr[i] for i in range(NX)]
    A = _mat(a_ref, NX, NX)
    Bm = _mat(b_ref, NX, NU)
    r = _vec(r_ref, NX)
    K = _mat(K_ref, NU, NX)
    kf = _vec(k_ref, NU)

    du = [
        sum(K[l][j] * dx[j] for j in range(NX)) + kf[l] for l in range(NU)
    ]
    if clip:
        lo = _vec(lo_ref, NU)
        hi = _vec(hi_ref, NU)
        du = [jnp.minimum(jnp.maximum(du[l], lo[l]), hi[l]) for l in range(NU)]

    for i in range(NX):
        dx_out[0, i, 0] = dx[i]
    for l in range(NU):
        du_out[0, l, 0] = du[l]

    nxt = [
        sum(A[i][j] * dx[j] for j in range(NX))
        + sum(Bm[i][l] * du[l] for l in range(NU))
        + r[i]
        for i in range(NX)
    ]
    for i in range(NX):
        dx_scr[i] = nxt[i]

    @pl.when(s == n_stages - 1)
    def _():
        for i in range(NX):
            dxN_out[0, i, 0] = nxt[i]


def _stage_spec(d, reverse, n_stages):
    if reverse:
        return pl.BlockSpec(
            (1, d, 1, SUB, LANE),
            lambda i, s: (n_stages - 1 - s, 0, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (1, d, 1, SUB, LANE),
        lambda i, s: (s, 0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _pinned_spec(d, stage):
    return pl.BlockSpec(
        (1, d, 1, SUB, LANE),
        lambda i, s: (stage, 0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def riccati_sweep_packed(
    hxx, sig_x, huu, sig_u, ghat_x, ghat_u, a, b, r, dx0,
    clip_lo=None, clip_hi=None, *, interpret: bool = False,
):
    """Packed-layout Riccati sweep (backward + forward).

    Shapes (packed; nb = B // 1024):
      hxx (N+1,100,nb,8,128), sig_x (N+1,10,...) full-state diag additions,
      huu (N,16,...), sig_u (N,4,...), ghat_x (N+1,10,...), ghat_u (N,4,...),
      a (N,100,...), b (N,40,...), r (N,10,...), dx0 (1,10,...),
      clip_lo/hi (N,4,...) or None.
    Returns (dx (N+1,10,...), du (N,4,...)).
    """
    Np1, _, nb = hxx.shape[:3]
    N = Np1 - 1
    dt = hxx.dtype

    grid = (nb, N)
    out_shape_b = (
        jax.ShapeDtypeStruct((N, NU * NX, nb, SUB, LANE), dt),
        jax.ShapeDtypeStruct((N, NU, nb, SUB, LANE), dt),
    )
    K, kf = pl.pallas_call(
        _backward_kernel,
        grid=grid,
        in_specs=[
            _stage_spec(NX * NX, True, N),  # hxx (stage rows 0..N-1)
            _stage_spec(NX, True, N),  # sig_x
            _stage_spec(NU * NU, True, N),  # huu
            _stage_spec(NU, True, N),  # sig_u
            _stage_spec(NX, True, N),  # ghat_x
            _stage_spec(NU, True, N),  # ghat_u
            _stage_spec(NX * NX, True, N),  # a
            _stage_spec(NX * NU, True, N),  # b
            _stage_spec(NX, True, N),  # r
            _pinned_spec(NX * NX, N),  # hxx terminal
            _pinned_spec(NX, N),  # sig_x terminal
            _pinned_spec(NX, N),  # ghat_x terminal
        ],
        out_specs=[
            _stage_spec(NU * NX, True, N),
            _stage_spec(NU, True, N),
        ],
        out_shape=out_shape_b,
        scratch_shapes=[
            pltpu.VMEM((NX * NX, SUB, LANE), dt),
            pltpu.VMEM((NX, SUB, LANE), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(hxx, sig_x, huu, sig_u, ghat_x, ghat_u, a, b, r, hxx, sig_x, ghat_x)

    clip = clip_lo is not None
    if not clip:
        clip_lo = jnp.zeros((N, NU, nb, SUB, LANE), dt)
        clip_hi = clip_lo
    out_shape_f = (
        jax.ShapeDtypeStruct((N, NX, nb, SUB, LANE), dt),
        jax.ShapeDtypeStruct((N, NU, nb, SUB, LANE), dt),
        jax.ShapeDtypeStruct((1, NX, nb, SUB, LANE), dt),
    )
    dx019 , du, dxN = pl.pallas_call(
        functools.partial(_forward_kernel, n_stages=N, clip=clip),
        grid=grid,
        in_specs=[
            _stage_spec(NX * NX, False, N),  # a
            _stage_spec(NX * NU, False, N),  # b
            _stage_spec(NX, False, N),  # r
            _stage_spec(NU * NX, False, N),  # K
            _stage_spec(NU, False, N),  # k
            _stage_spec(NU, False, N),  # lo
            _stage_spec(NU, False, N),  # hi
            _pinned_spec(NX, 0),  # dx0 (stage-constant)
        ],
        out_specs=[
            _stage_spec(NX, False, N),
            _stage_spec(NU, False, N),
            _pinned_spec(NX, 0),
        ],
        out_shape=out_shape_f,
        scratch_shapes=[pltpu.VMEM((NX, SUB, LANE), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(a, b, r, K, kf, clip_lo, clip_hi, dx0)

    dx = jnp.concatenate([dx019, dxN], axis=0)
    return dx, du
