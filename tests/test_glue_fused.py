"""Glue-fused IPM iteration vs the jnp-glue reference path.

`riccati_iter_fused` folds `ipm_corr_terms`, the slack/dual direction
recovery, the fraction-to-boundary ratios, and the complementarity partials
into the two sweep kernels. These tests assert (interpret mode, CPU) that a
multi-iteration `ipm_sparse` run is numerically identical between
`fuse_glue=True` and the elementwise-jnp path it replaces — cold, warm, and
with the far-regime fallback start engaged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndp_nmpc_qd_tpu.models.quadrotor import hover_input, hover_state
from ndp_nmpc_qd_tpu.ops.pallas.riccati import BLOCK
from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.solver.ocp_sparse import make_ocp_functions_sparse
from ndp_nmpc_qd_tpu.solver.qp_ipm_sparse import IpmWarm, ipm_sparse


@pytest.fixture(scope="module")
def qp_case():
    cfg = NdpNmpcConfig()
    N = cfg.ocp.N_node
    B = BLOCK
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    pos = jax.random.uniform(k1, (B, 3), jnp.float32, -3.0, 3.0)
    x0 = hover_state(pos)
    xr = jnp.tile(
        hover_state(jnp.zeros((B, 3), jnp.float32))[:, None, :], (1, N + 1, 1)
    )
    xb = xr.at[:, :, 6:10].add(
        0.2 * jax.random.normal(k2, (B, N + 1, 4), jnp.float32)
    )
    ur = jnp.tile(hover_input(cfg.vehicle, (B,))[:, None, :], (1, N, 1))
    f = 0.3 * jax.random.normal(k3, (B, N + 1, 3), jnp.float32)
    lin_s, consts, _ = make_ocp_functions_sparse(cfg.ocp, cfg.vehicle, True)
    qp, dx0_p = lin_s(xb, ur, xr, ur, f, x0)
    return qp, consts, dx0_p


def _run(qp, consts, dx0_p, fuse, warm=None, iters=4):
    return ipm_sparse(
        qp, consts, dx0_p, num_iters=iters, interpret=True,
        warm=warm, fuse_glue=fuse,
    )


def test_fused_matches_jnp_glue_cold(qp_case):
    qp, consts, dx0_p = qp_case
    zx_a, zu_a, mu_a, eq_a, _ = _run(qp, consts, dx0_p, False)
    zx_b, zu_b, mu_b, eq_b, _ = _run(qp, consts, dx0_p, True)
    np.testing.assert_allclose(np.asarray(zu_a), np.asarray(zu_b), atol=2e-5)
    np.testing.assert_allclose(np.asarray(zx_a), np.asarray(zx_b), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(mu_a), np.asarray(mu_b), rtol=1e-4, atol=1e-7
    )


def test_fused_matches_jnp_glue_warm(qp_case):
    """Warm path: carried multipliers + res2-based eq_res must agree too."""
    qp, consts, dx0_p = qp_case
    _, _, _, _, w_a = _run(qp, consts, dx0_p, False, iters=3)
    _, _, _, _, w_b = _run(qp, consts, dx0_p, True, iters=3)
    for fa, fb in zip(w_a, w_b):
        np.testing.assert_allclose(
            np.asarray(fa), np.asarray(fb), rtol=2e-4, atol=2e-5
        )
    zx_a, zu_a, mu_a, eq_a, _ = _run(qp, consts, dx0_p, False, warm=w_a)
    zx_b, zu_b, mu_b, eq_b, _ = _run(qp, consts, dx0_p, True, warm=w_b)
    np.testing.assert_allclose(np.asarray(zu_a), np.asarray(zu_b), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(eq_a), np.asarray(eq_b), rtol=1e-3, atol=1e-5
    )
