"""Kernel-layout-resident RtiState (`packed_state=True`) parity.

The packed-state controller keeps iterates + carried QP multipliers in the
kernel's batch-on-lanes layout across ticks and (whole-IPM path) folds the
SQP axpy into the kernel. These tests assert, in Pallas interpret mode on
CPU, that multi-tick closed-sequence results (u0, health, unpacked iterates)
are identical to the standard batch-first pallas controller — same
algorithm, different residency (VERDICT r3 item 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndp_nmpc_qd_tpu.models.quadrotor import hover_input, hover_state
from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.solver.rti import (
    make_batched_rti_controller,
    unpack_iterates,
)


def _mk(cfg, *, packed, whole, step=False):
    return make_batched_rti_controller(
        cfg.ocp, cfg.vehicle, with_disturbance=True, qp_iters=4,
        backend="pallas", interpret=True, warm_start=True,
        lqr_start=False, whole_ipm=whole, packed_state=packed,
        whole_step=step,
    )


def _case(B, N, cfg):
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    pos = jax.random.uniform(k1, (B, 3), jnp.float32, -2.0, 2.0)
    x0 = hover_state(pos)
    xr = jnp.tile(
        hover_state(jnp.zeros((B, 3), jnp.float32))[:, None, :], (1, N + 1, 1)
    )
    ur = jnp.tile(hover_input(cfg.vehicle, (B,))[:, None, :], (1, N, 1))
    f = 0.2 * jax.random.normal(k3, (B, N + 1, 3), jnp.float32)
    return x0, xr, ur, f


def test_whole_step_kernel_matches_two_kernel_path():
    """The ONE-launch control step (linearize + IPM + axpy fused,
    `ops/pallas/step_whole.py`) == the two-kernel packed-state path,
    element-level over 3 chained ticks."""
    cfg = NdpNmpcConfig()
    N = cfg.ocp.N_node
    B = 8
    x0, xr, ur, f = _case(B, N, cfg)

    ctl_a = _mk(cfg, packed=True, whole=True)
    ctl_b = _mk(cfg, packed=True, whole=True, step=True)
    st_a = ctl_a.reset(xr, ur)
    st_b = ctl_b.reset(xr, ur)
    for tick in range(3):
        u_a, st_a, info_a = ctl_a.update(st_a, x0, xr, ur, f)
        u_b, st_b, info_b = ctl_b.update(st_b, x0, xr, ur, f)
        np.testing.assert_allclose(
            np.asarray(u_a), np.asarray(u_b), atol=1e-5, err_msg=f"tick {tick}"
        )
        np.testing.assert_allclose(
            np.asarray(info_a.eq_res), np.asarray(info_b.eq_res),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(st_a.x_bar), np.asarray(st_b.x_bar), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(st_a.u_bar), np.asarray(st_b.u_bar), atol=2e-5
        )
        for la, lb in zip(st_a.ipm, st_b.ipm):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5
            )


@pytest.mark.parametrize("whole", [True, False])
@pytest.mark.parametrize("B", [8])
def test_packed_state_matches_batch_layout(whole, B):
    """3 chained ticks: packed-state (incl. the in-kernel axpy fold on the
    whole path and the lane-padding of B=8 < BLOCK) == batch-first."""
    cfg = NdpNmpcConfig()
    N = cfg.ocp.N_node
    x0, xr, ur, f = _case(B, N, cfg)

    ctl_a = _mk(cfg, packed=False, whole=whole)
    ctl_b = _mk(cfg, packed=True, whole=whole)
    assert ctl_b.layout == "kernel"

    st_a = ctl_a.reset(xr, ur)
    st_b = ctl_b.reset(xr, ur)
    for tick in range(3):
        u_a, st_a, info_a = ctl_a.update(st_a, x0, xr, ur, f)
        u_b, st_b, info_b = ctl_b.update(st_b, x0, xr, ur, f)
        np.testing.assert_allclose(
            np.asarray(u_a), np.asarray(u_b), atol=1e-5, err_msg=f"tick {tick}"
        )
        np.testing.assert_allclose(
            np.asarray(info_a.eq_res), np.asarray(info_b.eq_res),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(info_a.ok), np.asarray(info_b.ok)
        )
        xb_b, ub_b = unpack_iterates(st_b, B)
        np.testing.assert_allclose(
            np.asarray(st_a.x_bar), np.asarray(xb_b), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(st_a.u_bar), np.asarray(ub_b), atol=2e-5
        )
