"""Fused Pallas linearization kernel vs the jnp sparse path.

`ops/pallas/linearize.py` computes the whole SparseQp payload (RK4 tangents,
GN cost terms, defects, bounds, pinned-state residual) in one kernel pass.
These tests check every field element-for-element against
`solver/ocp_sparse.make_ocp_functions_sparse` (itself golden-tested against
the dense jacfwd linearization in test_sparse_path.py), in interpret mode on
CPU, with and without the NDP disturbance input, plus the end-to-end RTI
controller equivalence through the full IPM.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndp_nmpc_qd_tpu.models.quadrotor import hover_input, hover_state
from ndp_nmpc_qd_tpu.ops.pallas.riccati import BLOCK
from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.solver.ocp_sparse import (
    make_linearizer_pallas,
    make_ocp_functions_sparse,
)


@pytest.fixture(scope="module")
def iterates():
    cfg = NdpNmpcConfig()
    N = cfg.ocp.N_node
    B = BLOCK
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    pos = jax.random.uniform(k1, (B, 3), jnp.float32, -3.0, 3.0)
    x0 = hover_state(pos)
    xr = jnp.tile(
        hover_state(jnp.zeros((B, 3), jnp.float32))[:, None, :],
        (1, N + 1, 1),
    )
    xb = xr.at[:, :, 6:10].add(
        0.2 * jax.random.normal(k2, (B, N + 1, 4), jnp.float32)
    )
    xb = xb.at[:, :, 0:6].add(
        0.5 * jax.random.normal(k3, (B, N + 1, 6), jnp.float32)
    )
    ur = jnp.tile(hover_input(cfg.vehicle, (B,))[:, None, :], (1, N, 1))
    ub = ur.at[:, :, 0:3].add(0.3)
    f = 0.5 * jax.random.normal(key, (B, N + 1, 3), jnp.float32)
    return cfg, xb, ub, xr, ur, f, x0


@pytest.mark.parametrize("with_dist", [True, False])
# smoke tier's interpret-parity representative (VERDICT r4 item 7):
# the Pallas linearization kernel vs the jnp path, ~15 s/case
@pytest.mark.smoke
def test_kernel_matches_jnp_path(iterates, with_dist):
    cfg, xb, ub, xr, ur, f, x0 = iterates
    fd = f if with_dist else None
    lin_j, consts_j, _ = make_ocp_functions_sparse(
        cfg.ocp, cfg.vehicle, with_dist
    )
    lin_p, consts_p, _ = make_linearizer_pallas(
        cfg.ocp, cfg.vehicle, with_dist, interpret=True
    )
    assert consts_j == consts_p
    qj, dj = lin_j(xb, ub, xr, ur, fd, x0)
    qp, dp = lin_p(xb, ub, xr, ur, fd, x0)
    for name in qj._fields:
        a = np.asarray(getattr(qj, name), np.float64)
        b = np.asarray(getattr(qp, name), np.float64)
        err = np.max(np.abs(a - b))
        scale = max(1.0, float(np.max(np.abs(a))))
        assert err / scale < 5e-6, (name, err)
    assert np.max(np.abs(np.asarray(dj) - np.asarray(dp))) < 1e-5


def test_controller_end_to_end(iterates):
    """Full batched RTI update: fused-lin kernel vs jnp-lin, same IPM."""
    from ndp_nmpc_qd_tpu.solver.rti import make_batched_rti_controller

    cfg, xb, ub, xr, ur, f, x0 = iterates
    kw = dict(
        with_disturbance=True, qp_iters=4, backend="pallas", interpret=True
    )
    ctl_f = make_batched_rti_controller(
        cfg.ocp, cfg.vehicle, fused_lin=True, **kw
    )
    ctl_j = make_batched_rti_controller(
        cfg.ocp, cfg.vehicle, fused_lin=False, **kw
    )
    st = ctl_f.reset(xr, ur)
    u_f, st_f, info_f = ctl_f.update(st, x0, xr, ur, f)
    u_j, st_j, info_j = ctl_j.update(st, x0, xr, ur, f)
    np.testing.assert_allclose(u_f, u_j, atol=2e-5)
    np.testing.assert_allclose(st_f.x_bar, st_j.x_bar, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(info_f.ok), np.asarray(info_j.ok)
    )


def test_bf16_jac_dtype(iterates):
    """jac_dtype narrows only the curvature payloads, like the jnp path."""
    cfg, xb, ub, xr, ur, f, x0 = iterates
    lin_p, _, _ = make_linearizer_pallas(
        cfg.ocp, cfg.vehicle, True, jac_dtype=jnp.bfloat16, interpret=True
    )
    qp, _ = lin_p(xb, ub, xr, ur, f, x0)
    assert qp.hq.dtype == jnp.bfloat16
    assert qp.a.dtype == jnp.bfloat16
    assert qp.b.dtype == jnp.bfloat16
    assert qp.bc.dtype == xb.dtype  # collective columns stay full precision
    assert qp.gx.dtype == xb.dtype
    assert qp.r.dtype == xb.dtype
