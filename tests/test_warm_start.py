"""Dual warm-start of the sparse IPM across control ticks.

Validates (interpret mode on CPU):
- cold-sentinel semantics: reset marks scenarios cold, one update flips them,
- the warm-started controller converges to the same controls as the cold
  scan-path reference in closed loop at REDUCED iteration count,
- the (1 - alpha) equality-residual identity matches the true defect,
- recover_rti drops the warm state of re-seeded scenarios only.

Full-mission warm-vs-scan deviation on the real TPU is measured by
`tools/validate_backends.py --warm-iters N` (2026-08-18: max control
deviation 2.70e-5 at warm-iters=6, identical to the cold path at 12).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndp_nmpc_qd_tpu.models.quadrotor import hover_input, hover_state
from ndp_nmpc_qd_tpu.ops.pallas.riccati import BLOCK
from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.solver.rti import (
    make_batched_rti_controller,
    make_rti_controller,
)

_CFG = NdpNmpcConfig()


def _setup(B):
    N = _CFG.ocp.N_node
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (B, 3), jnp.float32, -2.0, 2.0)
    x0 = hover_state(pos)
    xr = jnp.tile(
        hover_state(jnp.zeros((B, 3), jnp.float32))[:, None, :], (1, N + 1, 1)
    )
    ur = jnp.tile(hover_input(_CFG.vehicle, (B,))[:, None, :], (1, N, 1))
    return x0, xr, ur


def test_cold_sentinel_lifecycle():
    B = BLOCK
    x0, xr, ur = _setup(B)
    ctl = make_batched_rti_controller(
        _CFG.ocp, _CFG.vehicle, with_disturbance=True, qp_iters=2,
        backend="pallas", interpret=True, warm_start=True,
    )
    st = ctl.reset(xr, ur)
    assert st.ipm is not None
    assert bool(jnp.all(st.ipm[4] < 0))  # all cold after reset
    u0, st, info = ctl.update(st, x0, xr, ur, None)
    assert bool(jnp.all(st.ipm[4] > 0))  # warm after one tick
    assert st.ipm[0].shape == (B, _CFG.ocp.N_node, 4)
    # multipliers are strictly positive (interior)
    for lam in st.ipm[:4]:
        assert bool(jnp.all(lam > 0))


def test_warm_matches_cold_reference_closed_loop():
    """Warm pallas @ 6 iters vs cold scan @ 12 iters, 6 closed-loop ticks."""
    from ndp_nmpc_qd_tpu.models.quadrotor import body_rate_dynamics
    from ndp_nmpc_qd_tpu.ops.integrators import make_discrete_dynamics

    B = BLOCK
    x0, xr, ur = _setup(B)
    sub = 6  # compare this many scenarios against the scan reference

    ctl_w = make_batched_rti_controller(
        _CFG.ocp, _CFG.vehicle, with_disturbance=True, qp_iters=6,
        backend="pallas", interpret=True, warm_start=True,
    )
    ctl_r = make_rti_controller(
        _CFG.ocp, _CFG.vehicle, with_disturbance=True, qp_iters=12
    )
    plant = make_discrete_dynamics(
        lambda x, u: body_rate_dynamics(
            x, u, mass=_CFG.vehicle.mass, gravity=_CFG.vehicle.gravity
        ),
        _CFG.ocp.ts_nmpc, 4,
    )

    st_w = ctl_w.reset(xr, ur)
    st_r = jax.vmap(lambda a, b: ctl_r.reset(a, b))(xr[:sub], ur[:sub])
    x_w = x0
    x_r = x0[:sub]
    max_dev = 0.0
    for k in range(6):
        u_w, st_w, info_w = ctl_w.update(st_w, x_w, xr, ur, None)
        u_r, st_r, info_r = jax.vmap(ctl_r.update)(
            st_r, x_r, xr[:sub], ur[:sub], jnp.zeros((sub, 21, 3), jnp.float32)
        )
        max_dev = max(max_dev, float(jnp.max(jnp.abs(u_w[:sub] - u_r))))
        assert bool(jnp.all(info_w.ok)), f"tick {k}"
        x_w = jax.vmap(plant)(x_w, u_w)
        x_r = x_w[:sub]
    assert max_dev < 2e-3, max_dev


def test_warm_eq_res_identity_matches_true_defect():
    from ndp_nmpc_qd_tpu.ops.pallas.riccati import pack
    from ndp_nmpc_qd_tpu.solver.ocp_sparse import make_ocp_functions_sparse
    from ndp_nmpc_qd_tpu.solver.qp_ipm_sparse import (
        IpmWarm,
        ipm_sparse,
        sparse_defect,
    )

    B = BLOCK
    N = _CFG.ocp.N_node
    x0, xr, ur = _setup(B)
    lin, consts, _ = make_ocp_functions_sparse(_CFG.ocp, _CFG.vehicle, True)
    qp, dx0_p = lin(xr, ur, xr, ur, None, x0)
    dt = jnp.float32
    warm = IpmWarm(
        lu_lo=pack(jnp.zeros((B, N, 4), dt)),
        lu_up=pack(jnp.zeros((B, N, 4), dt)),
        lx_lo=pack(jnp.zeros((B, N + 1, 3), dt)),
        lx_up=pack(jnp.zeros((B, N + 1, 3), dt)),
        mu=jnp.full((B // BLOCK, 8, 128), -1.0, dt),
    )
    zx, zu, mu, eq_res, new_warm = ipm_sparse(
        qp, consts, dx0_p, num_iters=4, interpret=True, warm=warm
    )
    eq = sparse_defect(qp, consts, zx, zu)
    eq_true = jnp.sqrt(
        jnp.sum(eq * eq, axis=(0, 1))
        + jnp.sum((dx0_p - zx[:1]) ** 2, axis=(0, 1))
    )
    np.testing.assert_allclose(
        np.asarray(eq_res), np.asarray(eq_true), atol=1e-4, rtol=1e-2
    )


@pytest.mark.smoke
def test_recover_rti_preserves_warm_structure():
    from ndp_nmpc_qd_tpu.utils.recovery import recover_rti

    B = 4
    N = _CFG.ocp.N_node
    x0, xr, ur = _setup(B)
    ipm = (
        jnp.ones((B, N, 4)), jnp.ones((B, N, 4)),
        jnp.ones((B, N + 1, 3)), jnp.ones((B, N + 1, 3)),
        jnp.full((B,), 0.5),
    )
    from ndp_nmpc_qd_tpu.solver.rti import RtiState

    st = RtiState(xr, ur, ipm)
    ok = jnp.asarray([True, False, True, False])
    out = recover_rti(st, ok, xr, ur)
    assert out.ipm is not None
    np.testing.assert_array_equal(np.asarray(out.ipm[4] < 0), ~np.asarray(ok))
    assert float(out.ipm[0][1].max()) == 0.0  # bad scenario's duals dropped
    assert float(out.ipm[0][0].min()) == 1.0  # good scenario untouched
