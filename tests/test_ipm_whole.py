"""Whole-solve persistent-VMEM IPM kernel vs the per-iteration kernel path.

`ops/pallas/ipm_whole.riccati_ipm_whole` runs the ENTIRE interior-point loop
(zero-control start, slack init, warm mixing, all iterations, updates) in one
Pallas launch. These tests assert (interpret mode, CPU) that it matches
`ipm_sparse(fuse_glue=True, lqr_start=False)` — the algorithm it replaces —
element-level on the primal solution, multipliers, barrier weight, and the
res2-based equality residual, for cold lanes, warm-carried lanes, and the
mixed case.
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
    key = jax.random.PRNGKey(7)
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


def _run(qp, consts, dx0_p, whole, warm=None, iters=4):
    return ipm_sparse(
        qp, consts, dx0_p, num_iters=iters, interpret=True,
        warm=warm, lqr_start=False, fuse_glue=True, whole_kernel=whole,
    )


def _cold_warm(qp):
    """All-cold-sentinel IpmWarm (the per-iteration path then uses the same
    init AND the same res2-based eq_res formula as the whole kernel)."""
    N = qp.gu.shape[0]
    tail = qp.gx.shape[2:]
    dt = qp.gx.dtype
    z = jnp.zeros
    return IpmWarm(
        lu_lo=z((N, 4) + tail, dt), lu_up=z((N, 4) + tail, dt),
        lx_lo=z((N + 1, 3) + tail, dt), lx_up=z((N + 1, 3) + tail, dt),
        mu=jnp.full(tail, -1.0, dt),
    )


def test_whole_matches_iter_kernels_cold(qp_case):
    qp, consts, dx0_p = qp_case
    cold = _cold_warm(qp)
    zx_a, zu_a, mu_a, eq_a, _ = _run(qp, consts, dx0_p, False, warm=cold)
    zx_b, zu_b, mu_b, eq_b, _ = _run(qp, consts, dx0_p, True, warm=cold)
    np.testing.assert_allclose(np.asarray(zu_a), np.asarray(zu_b), atol=5e-5)
    np.testing.assert_allclose(np.asarray(zx_a), np.asarray(zx_b), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(mu_a), np.asarray(mu_b), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(eq_a), np.asarray(eq_b), rtol=1e-3, atol=1e-5
    )


def test_whole_matches_iter_kernels_warm(qp_case):
    """Carried multipliers: warm state produced by each path must agree, and
    a second solve continued from it must agree too."""
    qp, consts, dx0_p = qp_case
    cold = _cold_warm(qp)
    _, _, _, _, w_a = _run(qp, consts, dx0_p, False, warm=cold, iters=3)
    _, _, _, _, w_b = _run(qp, consts, dx0_p, True, warm=cold, iters=3)
    for fa, fb in zip(w_a, w_b):
        np.testing.assert_allclose(
            np.asarray(fa), np.asarray(fb), rtol=2e-4, atol=2e-5
        )
    zx_a, zu_a, mu_a, eq_a, _ = _run(qp, consts, dx0_p, False, warm=w_a)
    zx_b, zu_b, mu_b, eq_b, _ = _run(qp, consts, dx0_p, True, warm=w_a)
    np.testing.assert_allclose(np.asarray(zu_a), np.asarray(zu_b), atol=5e-5)
    np.testing.assert_allclose(np.asarray(zx_a), np.asarray(zx_b), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(eq_a), np.asarray(eq_b), rtol=1e-3, atol=1e-5
    )


def test_whole_matches_iter_kernels_bf16_payload(qp_case):
    """Split-precision payload (hq/a/b bf16, bc/gx/gu/r f32 — the validated
    `jac_dtype=bf16` mode, `ocp_sparse.py` docstring): the whole-solve kernel
    must consume the narrow payload and still match the per-iteration kernel
    path element-level on the SAME bf16 inputs. Accuracy vs the f32 path is
    validated at mission level by `tools/validate_backends.py
    --whole-ipm-bf16` (5.9e-5 max control deviation)."""
    qp, consts, dx0_p = qp_case
    qp16 = qp._replace(
        hq=qp.hq.astype(jnp.bfloat16),
        a=qp.a.astype(jnp.bfloat16),
        b=qp.b.astype(jnp.bfloat16),
    )
    cold = _cold_warm(qp)
    zx_a, zu_a, mu_a, eq_a, _ = _run(qp16, consts, dx0_p, False, warm=cold)
    zx_b, zu_b, mu_b, eq_b, _ = _run(qp16, consts, dx0_p, True, warm=cold)
    np.testing.assert_allclose(np.asarray(zu_a), np.asarray(zu_b), atol=5e-5)
    np.testing.assert_allclose(np.asarray(zx_a), np.asarray(zx_b), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(eq_a), np.asarray(eq_b), rtol=1e-3, atol=1e-5
    )
    # and the narrow payload must actually have moved the direction a little
    # (guards against silent upcast-at-build): controls differ from the f32
    # run, but not garbage-level on the 0..27 m/s^2 thrust scale. This is a
    # single-QP TRANSIENT Newton-direction perturbation (measured 0.09 max
    # under this fixture's aggressive perturbations); the RTI fixed point is
    # exact and full-mission control deviation is 5.9e-5
    # (tools/validate_backends.py --whole-ipm-bf16, 2026-08-20).
    _, zu_f, _, _, _ = _run(qp, consts, dx0_p, True, warm=cold)
    d = np.abs(np.asarray(zu_f) - np.asarray(zu_b)).max()
    assert 0.0 < d < 0.5


def test_whole_warm_none_is_cold(qp_case):
    """warm=None must behave as the all-cold sentinel (one-shot solve)."""
    qp, consts, dx0_p = qp_case
    zx_a, zu_a, mu_a, _, _ = _run(qp, consts, dx0_p, True, warm=None, iters=3)
    zx_b, zu_b, mu_b, _, _ = _run(
        qp, consts, dx0_p, True, warm=_cold_warm(qp), iters=3
    )
    np.testing.assert_allclose(np.asarray(zu_a), np.asarray(zu_b), atol=1e-7)
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_b), atol=1e-9)
