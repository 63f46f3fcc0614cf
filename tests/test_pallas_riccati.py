"""Pallas Riccati kernel + packed IPM parity tests (interpret mode on CPU).

These validate the production TPU path element-for-element against the
scan-based reference implementation. Interpret mode is slow, so iteration
counts are kept small — full-accuracy TPU validation lives in the bench
pipeline (and was measured at 2e-6 vs a float64 ground truth).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndp_nmpc_qd_tpu.models.quadrotor import hover_input, hover_state
from ndp_nmpc_qd_tpu.ops.pallas.riccati import (
    BLOCK,
    pack,
    riccati_sweep_packed,
    unpack,
)
from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.solver.ocp import make_ocp_functions
from ndp_nmpc_qd_tpu.solver.qp_ipm import riccati_solve, solve_qp
from ndp_nmpc_qd_tpu.solver.qp_ipm_packed import solve_qp_packed


@pytest.fixture(scope="module")
def qp_batch():
    cfg = NdpNmpcConfig()
    lin, _ = make_ocp_functions(cfg.ocp, cfg.vehicle, True)
    N = cfg.ocp.N_node
    B = BLOCK
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (B, 3), jnp.float32, -3.0, 3.0)
    x0 = hover_state(pos)
    xr = jnp.tile(hover_state(jnp.zeros((B, 3), jnp.float32))[:, None, :], (1, N + 1, 1))
    ur = jnp.tile(hover_input(cfg.vehicle, (B,))[:, None, :], (1, N, 1))
    f = jnp.zeros((B, N + 1, 3), jnp.float32)
    qp = jax.vmap(lin)(xr, ur, xr, ur, f)
    dx0 = x0 - xr[:, 0]
    return cfg, qp, dx0


def test_pack_unpack_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((BLOCK, 21, 10)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(unpack(pack(x), (10,))), np.asarray(x))


def test_kernel_sweep_matches_scan_reference(qp_batch):
    cfg, qp, dx0 = qp_batch
    N = cfg.ocp.N_node
    B = BLOCK

    sig_u = jnp.zeros((B, N, 4), jnp.float32)
    sig_x = jnp.zeros((B, N + 1, 3), jnp.float32)
    dx_ref, du_ref = jax.vmap(
        lambda q, su, sx, d: riccati_solve(q, su, sx, q.gx, q.gu, q.r, d)
    )(qp, sig_u, sig_x, dx0)

    dx_k, du_k = riccati_sweep_packed(
        pack(qp.Hxx), pack(jnp.zeros((B, N + 1, 10), jnp.float32)),
        pack(qp.Huu), pack(jnp.zeros((B, N, 4), jnp.float32)),
        pack(qp.gx), pack(qp.gu), pack(qp.A), pack(qp.B), pack(qp.r),
        pack(dx0[:, None, :]),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(unpack(du_k, (4,))), np.asarray(du_ref), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(unpack(dx_k, (10,))), np.asarray(dx_ref), atol=5e-5
    )


def test_packed_ipm_matches_reference(qp_batch):
    cfg, qp, dx0 = qp_batch
    sol_p = solve_qp_packed(qp, dx0, num_iters=6, interpret=True)
    sub = 16
    qp_s = jax.tree.map(lambda x: x[:sub], qp)
    sol_r = jax.vmap(functools.partial(solve_qp, num_iters=6))(qp_s, dx0[:sub])
    np.testing.assert_allclose(
        np.asarray(sol_p.du[:sub]), np.asarray(sol_r.du), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sol_p.eq_res[:sub]), np.asarray(sol_r.eq_res), atol=1e-4
    )


def test_batched_controller_interpret_matches_vmapped(qp_batch):
    from ndp_nmpc_qd_tpu.solver.rti import (
        make_batched_rti_controller,
        make_rti_controller,
    )

    cfg, qp, dx0 = qp_batch
    N = cfg.ocp.N_node
    B = BLOCK
    key = jax.random.PRNGKey(1)
    pos = jax.random.uniform(key, (B, 3), jnp.float32, -1.0, 1.0)
    x0 = hover_state(pos)
    xr = jnp.tile(hover_state(jnp.zeros((B, 3), jnp.float32))[:, None, :], (1, N + 1, 1))
    ur = jnp.tile(hover_input(cfg.vehicle, (B,))[:, None, :], (1, N, 1))
    f = jnp.zeros((B, N + 1, 3), jnp.float32)

    ctl_b = make_batched_rti_controller(
        cfg.ocp, cfg.vehicle, with_disturbance=True, qp_iters=4,
        backend="pallas", interpret=True,
    )
    ctl_v = make_rti_controller(cfg.ocp, cfg.vehicle, with_disturbance=True, qp_iters=4)

    st_b = ctl_b.reset(xr, ur)
    u0_b, _, info_b = ctl_b.update(st_b, x0, xr, ur, f)

    sub = 8
    st_v = jax.vmap(ctl_v.reset)(xr[:sub], ur[:sub])
    u0_v, _, info_v = jax.vmap(ctl_v.update)(
        st_v, x0[:sub], xr[:sub], ur[:sub], f[:sub]
    )
    np.testing.assert_allclose(np.asarray(u0_b[:sub]), np.asarray(u0_v), atol=1e-4)
