"""Packed (batch-last) linearization must match the batch-first reference
path element for element."""

import jax
import jax.numpy as jnp
import numpy as np

from ndp_nmpc_qd_tpu.models.quadrotor import hover_input, hover_state
from ndp_nmpc_qd_tpu.ops.pallas.riccati import BLOCK, unpack
from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.solver.ocp import make_ocp_functions
from ndp_nmpc_qd_tpu.solver.ocp_packed import make_ocp_functions_packed


def test_packed_linearization_matches_reference(rng):
    cfg = NdpNmpcConfig()
    lin_ref, _ = make_ocp_functions(cfg.ocp, cfg.vehicle, True)
    lin_pk, _ = make_ocp_functions_packed(cfg.ocp, cfg.vehicle, True)
    N = cfg.ocp.N_node
    B = BLOCK

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pos = jax.random.uniform(k1, (B, 3), jnp.float32, -2.0, 2.0)
    x0 = hover_state(pos)
    # non-trivial iterates: random attitude perturbation + velocity
    xbar = jnp.tile(x0[:, None, :], (1, N + 1, 1))
    xbar = xbar.at[:, :, 3:6].add(
        jax.random.uniform(k2, (B, N + 1, 3), jnp.float32, -1, 1)
    )
    xbar = xbar.at[:, :, 6:10].add(
        jax.random.uniform(k3, (B, N + 1, 4), jnp.float32, -0.1, 0.1)
    )
    ubar = jnp.tile(hover_input(cfg.vehicle, (B,))[:, None, :], (1, N, 1))
    ubar = ubar.at[:, :, 0:3].add(
        jax.random.uniform(k4, (B, N, 3), jnp.float32, -2, 2)
    )
    xr = jnp.tile(hover_state(jnp.zeros((B, 3), jnp.float32))[:, None, :], (1, N + 1, 1))
    ur = jnp.tile(hover_input(cfg.vehicle, (B,))[:, None, :], (1, N, 1))
    fd = jax.random.uniform(key, (B, N + 1, 3), jnp.float32, -1, 1)

    qp_ref = jax.vmap(lin_ref)(xbar, ubar, xr, ur, fd)
    qp_pk, dx0_p = lin_pk(xbar, ubar, xr, ur, fd, x0)

    def U(x, tr):
        return np.asarray(unpack(x, tr))

    np.testing.assert_allclose(
        U(qp_pk.hxx, (10, 10)).reshape(B, N + 1, 10, 10),
        np.asarray(qp_ref.Hxx), atol=2e-4,
    )
    np.testing.assert_allclose(
        U(qp_pk.huu, (4, 4)).reshape(B, N, 4, 4), np.asarray(qp_ref.Huu), atol=1e-5
    )
    np.testing.assert_allclose(U(qp_pk.gx, (10,)), np.asarray(qp_ref.gx), atol=2e-4)
    np.testing.assert_allclose(U(qp_pk.gu, (4,)), np.asarray(qp_ref.gu), atol=1e-5)
    np.testing.assert_allclose(
        U(qp_pk.a, (10, 10)).reshape(B, N, 10, 10), np.asarray(qp_ref.A), atol=1e-5
    )
    np.testing.assert_allclose(
        U(qp_pk.b, (10, 4)).reshape(B, N, 10, 4), np.asarray(qp_ref.B), atol=1e-5
    )
    np.testing.assert_allclose(U(qp_pk.r, (10,)), np.asarray(qp_ref.r), atol=1e-5)
    np.testing.assert_allclose(U(qp_pk.lu, (4,)), np.asarray(qp_ref.lu), atol=1e-6)
    np.testing.assert_allclose(U(qp_pk.ux, (3,)), np.asarray(qp_ref.ux), atol=1e-6)
    np.testing.assert_allclose(
        U(dx0_p, (10,))[:, 0], np.asarray(x0 - xbar[:, 0]), atol=1e-6
    )
    # the GN cross block is exactly zero for this OCP (kernel assumption)
    assert float(jnp.max(jnp.abs(qp_ref.Hxu))) == 0.0
