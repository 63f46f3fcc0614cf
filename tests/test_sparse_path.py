"""Structure-sparse fused Pallas path: layout + kernel parity tests.

Validates, on CPU (interpret mode):
1. the sparsity claims behind `solver/ocp_sparse.py` — the dense jacfwd
   sensitivities really do have the exact block structure the kernels bake in,
2. the sparse linearization reconstructs the dense one element-for-element,
3. the fused sweep (in-kernel ghat/rhat assembly) matches the scan-based
   `riccati_solve` on a nonzero iterate,
4. the full sparse IPM matches the reference `solve_qp`.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndp_nmpc_qd_tpu.models.quadrotor import hover_input, hover_state
from ndp_nmpc_qd_tpu.ops.pallas.riccati import BLOCK, pack, unpack
from ndp_nmpc_qd_tpu.ops.pallas.riccati_sparse import riccati_sweep_sparse
from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.solver.ocp import make_ocp_functions
from ndp_nmpc_qd_tpu.solver.ocp_sparse import (
    a_dense_from_sparse,
    b_dense_from_sparse,
    make_ocp_functions_sparse,
)
from ndp_nmpc_qd_tpu.solver.qp_ipm import riccati_solve, solve_qp
from ndp_nmpc_qd_tpu.solver.qp_ipm_sparse import ipm_sparse, sparse_defect


@pytest.fixture(scope="module")
def lin_pair():
    cfg = NdpNmpcConfig()
    N = cfg.ocp.N_node
    B = BLOCK
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    pos = jax.random.uniform(k1, (B, 3), jnp.float32, -3.0, 3.0)
    x0 = hover_state(pos)
    # a non-trivial iterate: random attitude perturbations + rates
    xr = jnp.tile(
        hover_state(jnp.zeros((B, 3), jnp.float32))[:, None, :], (1, N + 1, 1)
    )
    dq = 0.2 * jax.random.normal(k2, (B, N + 1, 4), jnp.float32)
    xb = xr.at[:, :, 6:10].add(dq)
    xb = xb.at[:, :, 0:6].add(
        0.5 * jax.random.normal(k3, (B, N + 1, 6), jnp.float32)
    )
    ur = jnp.tile(hover_input(cfg.vehicle, (B,))[:, None, :], (1, N, 1))
    ub = ur.at[:, :, 0:3].add(0.3)
    f = 0.5 * jax.random.normal(key, (B, N + 1, 3), jnp.float32)

    lin_d, _ = make_ocp_functions(cfg.ocp, cfg.vehicle, True)
    qp_dense = jax.vmap(lin_d)(xb, ub, xr, ur, f)
    lin_s, consts, _ = make_ocp_functions_sparse(cfg.ocp, cfg.vehicle, True)
    qp_sparse, dx0_p = lin_s(xb, ub, xr, ur, f, x0)
    dx0 = x0 - xb[:, 0]
    return cfg, qp_dense, qp_sparse, consts, dx0, dx0_p


def test_sparse_blocks_reconstruct_dense(lin_pair):
    cfg, qd, qs, consts, dx0, _ = lin_pair
    a40 = unpack(qs.a, (40,))
    A = a_dense_from_sparse(a40, consts.h)
    B = b_dense_from_sparse(unpack(qs.b, (30,)), unpack(qs.bc, (6,)))
    np.testing.assert_allclose(np.asarray(A), np.asarray(qd.A), atol=2e-6)
    np.testing.assert_allclose(np.asarray(B), np.asarray(qd.B), atol=2e-6)
    # Hessian: q-block + constant diagonals
    hq = unpack(qs.hq, (4, 4))
    np.testing.assert_allclose(
        np.asarray(hq), np.asarray(qd.Hxx[:, :, 6:10, 6:10]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(unpack(qs.gx, (10,))), np.asarray(qd.gx), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(unpack(qs.gu, (4,))), np.asarray(qd.gu), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(unpack(qs.r, (10,))), np.asarray(qd.r), atol=2e-6
    )
    for name in ("lu", "uu", "lx", "ux"):
        np.testing.assert_allclose(
            np.asarray(unpack(getattr(qs, name), (getattr(qs, name).shape[1],))),
            np.asarray(getattr(qd, name)),
            atol=1e-6,
        )


def test_dense_jacobians_have_claimed_structure(lin_pair):
    """The bits the sparse path does NOT store must be exact constants."""
    cfg, qd, _, consts, _, _ = lin_pair
    A = np.asarray(qd.A)
    h = consts.h
    eye = np.broadcast_to(np.eye(3), A.shape[:2] + (3, 3))
    np.testing.assert_allclose(A[:, :, 0:3, 0:3], eye, atol=1e-6)
    np.testing.assert_allclose(A[:, :, 0:3, 3:6], h * eye, atol=1e-6)
    np.testing.assert_allclose(A[:, :, 3:10, 0:3], 0.0, atol=1e-6)
    np.testing.assert_allclose(A[:, :, 3:6, 3:6], eye, atol=1e-6)
    np.testing.assert_allclose(A[:, :, 6:10, 3:6], 0.0, atol=1e-6)
    B = np.asarray(qd.B)
    np.testing.assert_allclose(B[:, :, 6:10, 3], 0.0, atol=1e-6)
    # Huu is the constant diagonal baked into the kernel
    np.testing.assert_allclose(
        np.asarray(qd.Huu),
        np.broadcast_to(np.diag(consts.rdiag_stage), qd.Huu.shape),
        atol=1e-5,
    )
    # Hxx pos/vel diagonal is constant (stage-scaled except terminal);
    # off-diag pos/vel rows vanish
    Hxx = np.asarray(qd.Hxx)
    np.testing.assert_allclose(
        Hxx[:, :-1, 0:6, 0:6],
        np.broadcast_to(np.diag(consts.diag6_stage), Hxx.shape[:1] + Hxx.shape[1:2] + (6, 6))[:, :-1],
        atol=1e-3,
    )
    np.testing.assert_allclose(
        Hxx[:, -1, 0:6, 0:6],
        np.broadcast_to(np.diag(consts.diag6_term), Hxx.shape[:1] + (6, 6)),
        atol=1e-3,
    )
    np.testing.assert_allclose(Hxx[:, :, 0:6, 6:10], 0.0, atol=1e-6)


def test_fused_sweep_matches_scan_reference(lin_pair):
    cfg, qd, qs, consts, dx0, dx0_p = lin_pair
    N = cfg.ocp.N_node
    B = BLOCK
    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    zx = 0.1 * jax.random.normal(k1, (B, N + 1, 10), jnp.float32)
    zu = 0.1 * jax.random.normal(k2, (B, N, 4), jnp.float32)
    sig_u = jax.random.uniform(k3, (B, N, 4), jnp.float32, 0.1, 2.0)
    sig_x = jax.random.uniform(k4, (B, N + 1, 3), jnp.float32, 0.1, 2.0)
    corr_u = 0.1 * jax.random.normal(k3, (B, N, 4), jnp.float32)
    corr_x = 0.1 * jax.random.normal(k4, (B, N + 1, 3), jnp.float32)

    # scan-path reference: assemble ghat/rhat by hand (as qp_ipm.solve_qp does)
    def ref_one(q, zx, zu, sig_u, sig_x, corr_u, corr_x, d0):
        gx_lin = q.gx + jnp.einsum("nij,nj->ni", q.Hxx, zx)
        gu_lin = q.gu + jnp.einsum("nij,nj->ni", q.Huu, zu)
        ghat_x = gx_lin.at[:, 3:6].add(corr_x)
        ghat_u = gu_lin + corr_u
        rhat = (
            jnp.einsum("nij,nj->ni", q.A, zx[:N])
            + jnp.einsum("nij,nj->ni", q.B, zu)
            + q.r
            - zx[1:]
        )
        return riccati_solve(
            q, sig_u, sig_x, ghat_x, ghat_u, rhat, d0 - zx[0]
        )

    dx_ref, du_ref = jax.vmap(ref_one)(
        qd, zx, zu, sig_u, sig_x, corr_u, corr_x, dx0
    )

    dx_k, du_k, rhat_k = riccati_sweep_sparse(
        qs.hq, qs.gx, qs.gu, qs.a, qs.b, qs.bc, qs.r,
        pack(zx), pack(zu), pack(sig_u), pack(sig_x), pack(corr_u),
        pack(corr_x), dx0_p - pack(zx)[:1],
        h=consts.h, diag6_stage=consts.diag6_stage,
        diag6_term=consts.diag6_term, rdiag_stage=consts.rdiag_stage,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(unpack(du_k, (4,))), np.asarray(du_ref), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(unpack(dx_k, (10,))), np.asarray(dx_ref), atol=1e-4
    )
    # the fused defect output
    rhat_ref = jax.vmap(
        lambda q, zx, zu: jnp.einsum("nij,nj->ni", q.A, zx[:N])
        + jnp.einsum("nij,nj->ni", q.B, zu)
        + q.r
        - zx[1:]
    )(qd, zx, zu)
    np.testing.assert_allclose(
        np.asarray(unpack(rhat_k, (10,))), np.asarray(rhat_ref), atol=5e-5
    )


def test_sparse_defect_matches_dense(lin_pair):
    cfg, qd, qs, consts, dx0, _ = lin_pair
    N = cfg.ocp.N_node
    B = BLOCK
    key = jax.random.PRNGKey(3)
    zx = 0.3 * jax.random.normal(key, (B, N + 1, 10), jnp.float32)
    zu = 0.3 * jax.random.normal(key, (B, N, 4), jnp.float32)
    got = sparse_defect(qs, consts, pack(zx), pack(zu))
    want = jax.vmap(
        lambda q, zx, zu: jnp.einsum("nij,nj->ni", q.A, zx[:N])
        + jnp.einsum("nij,nj->ni", q.B, zu)
        + q.r
        - zx[1:]
    )(qd, zx, zu)
    np.testing.assert_allclose(
        np.asarray(unpack(got, (10,))), np.asarray(want), atol=5e-5
    )


def test_sparse_ipm_matches_reference(lin_pair):
    cfg, qd, qs, consts, dx0, dx0_p = lin_pair
    zx, zu, mu, eq, _warm = ipm_sparse(
        qs, consts, dx0_p, num_iters=6, interpret=True
    )
    sub = 16
    qp_s = jax.tree.map(lambda x: x[:sub], qd)
    sol_r = jax.vmap(functools.partial(solve_qp, num_iters=6))(qp_s, dx0[:sub])
    np.testing.assert_allclose(
        np.asarray(unpack(zu, (4,)))[:sub], np.asarray(sol_r.du), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(eq.reshape(-1))[:sub], np.asarray(sol_r.eq_res), atol=1e-4
    )


def test_bf16_jacobian_path(lin_pair):
    """bf16 curvature storage: kernels accept mixed dtypes, outputs stay f32,
    directions agree with the f32 path to bf16-rounding order."""
    cfg, qd, qs32, consts, dx0, dx0_p = lin_pair
    # same linearization point as the fixture, curvature payloads cast down
    # (what make_ocp_functions_sparse(jac_dtype=bf16) emits)
    # what make_ocp_functions_sparse(jac_dtype=bf16) emits: hq/a/b omega
    # columns narrowed, bc (collective columns) kept f32
    qs = qs32._replace(
        hq=qs32.hq.astype(jnp.bfloat16),
        a=qs32.a.astype(jnp.bfloat16),
        b=qs32.b.astype(jnp.bfloat16),
    )
    zx, zu, mu, eq, _warm = ipm_sparse(
        qs, consts, dx0_p, num_iters=2, interpret=True
    )
    assert zx.dtype == jnp.float32 and zu.dtype == jnp.float32
    zx32, zu32, _, _, _ = ipm_sparse(
        qs32, consts, dx0_p, num_iters=2, interpret=True
    )
    # bf16 has ~3 decimal digits; directions should agree to that order
    np.testing.assert_allclose(
        np.asarray(zu), np.asarray(zu32), atol=0.05
    )


def test_sparse_ipm_multiblock_tiles():
    """nb=2 exercises the nbt>1 grid tiling (multiple batch blocks per
    Pallas grid step); parity vs the scan solver on a subset."""
    cfg = NdpNmpcConfig()
    N = cfg.ocp.N_node
    B = 2 * BLOCK
    key = jax.random.PRNGKey(11)
    pos = jax.random.uniform(key, (B, 3), jnp.float32, -2.0, 2.0)
    x0 = hover_state(pos)
    xr = jnp.tile(
        hover_state(jnp.zeros((B, 3), jnp.float32))[:, None, :], (1, N + 1, 1)
    )
    ur = jnp.tile(hover_input(cfg.vehicle, (B,))[:, None, :], (1, N, 1))
    lin_s, consts, _ = make_ocp_functions_sparse(cfg.ocp, cfg.vehicle, True)
    qs, dx0_p = lin_s(xr, ur, xr, ur, None, x0)
    zx, zu, mu, eq, _ = ipm_sparse(
        qs, consts, dx0_p, num_iters=3, interpret=True
    )
    lin_d, _ = make_ocp_functions(cfg.ocp, cfg.vehicle, True)
    sub = 8
    # compare a spread of scenarios across BOTH batch blocks
    idx = np.linspace(0, B - 1, sub).astype(int)
    f = jnp.zeros((sub, N + 1, 3), jnp.float32)
    qd = jax.vmap(lin_d)(xr[idx], ur[idx], xr[idx], ur[idx], f)
    sol = jax.vmap(functools.partial(solve_qp, num_iters=3))(
        qd, x0[idx] - xr[idx, 0]
    )
    np.testing.assert_allclose(
        np.asarray(unpack(zu, (4,)))[idx], np.asarray(sol.du), atol=1e-4
    )


def test_inkernel_hold_rollout_matches_reference(lin_pair):
    """The zero-control rollout fused into the forward kernel (with_hold)
    must equal the jnp reference `sparse_rollout_zero_u`."""
    from ndp_nmpc_qd_tpu.solver.qp_ipm_sparse import sparse_rollout_zero_u

    cfg, _, qp_s, consts, _, dx0_p = lin_pair
    N = cfg.ocp.N_node
    tail = qp_s.r.shape[2:]
    zeros_su = jnp.zeros((N, 4) + tail, jnp.float32)
    zeros_sx = jnp.zeros((N + 1, 10) + tail, jnp.float32)
    zeros_s3 = jnp.zeros((N + 1, 3) + tail, jnp.float32)
    margin = 1e-3 * (qp_s.uu - qp_s.lu)
    _, _, _, dx_hold = riccati_sweep_sparse(
        qp_s.hq, qp_s.gx, qp_s.gu, qp_s.a, qp_s.b, qp_s.bc, qp_s.r,
        zeros_sx, zeros_su, zeros_su, zeros_s3, zeros_su, zeros_s3, dx0_p,
        clip_lo=qp_s.lu + margin, clip_hi=qp_s.uu - margin,
        h=consts.h, diag6_stage=consts.diag6_stage,
        diag6_term=consts.diag6_term, rdiag_stage=consts.rdiag_stage,
        interpret=True, with_hold=True,
    )
    ref = sparse_rollout_zero_u(qp_s, consts, dx0_p)
    np.testing.assert_allclose(
        np.asarray(dx_hold), np.asarray(ref), rtol=0, atol=1e-5
    )
