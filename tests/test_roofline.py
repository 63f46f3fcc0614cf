"""Roofline accounting sanity (utils/roofline.py)."""

import pytest

from ndp_nmpc_qd_tpu.utils.roofline import (
    ipm_bytes,
    roofline_report,
    step_cost,
)

# fast tier (VERDICT r4 item 7): this whole file is in the <5 min smoke set
pytestmark = pytest.mark.smoke


def test_whole_kernel_cuts_ipm_traffic():
    per_iter = ipm_bytes(N=20, qp_iters=6, whole_kernel=False)
    whole = ipm_bytes(N=20, qp_iters=6, whole_kernel=True)
    # the whole-solve kernel reads the payload once instead of per
    # iteration: traffic must drop by well over the 2.5x VERDICT floor
    assert whole["ipm"] < per_iter["ipm"] / 2.5
    # and the per-iteration path scales ~linearly in iterations
    p12 = ipm_bytes(N=20, qp_iters=12, whole_kernel=False)
    assert abs(p12["ipm"] - 2 * per_iter["ipm"]) < 1e-6
    # whole-kernel traffic is independent of the iteration count
    w12 = ipm_bytes(N=20, qp_iters=12, whole_kernel=True)
    assert w12["ipm"] == whole["ipm"]


def test_bf16_cuts_payload():
    f32 = step_cost(N=20, qp_iters=6, jac_bf16=False, whole_kernel=True)
    b16 = step_cost(N=20, qp_iters=6, jac_bf16=True, whole_kernel=True)
    assert b16.hbm_bytes < f32.hbm_bytes
    # halving the 1736-float jac payload (written by linearize, read by the
    # IPM) must save >10% of the whole step's traffic
    assert b16.hbm_bytes < 0.9 * f32.hbm_bytes


def test_report_shape():
    cost = step_cost()
    rep = roofline_report(cost, solves_per_s=2.0e6)
    assert rep["achieved_gb_s"] > 0
    assert 0 < rep["hbm_roofline_pct"] < 1000
    assert set(rep["bytes_breakdown"]) == {
        "mlp", "pack", "linearize", "ipm", "rti_glue",
    }


def test_lqr_start_adds_a_sweep():
    base = step_cost(N=20, qp_iters=6, lqr_start=False)
    lqr = step_cost(N=20, qp_iters=6, lqr_start=True)
    assert lqr.hbm_bytes > base.hbm_bytes
