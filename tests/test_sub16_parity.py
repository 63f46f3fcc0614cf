"""Parity coverage for the SHIPPED tile configuration QD_TPU_SUB=16.

The packed kernels read QD_TPU_SUB at import (`ops/pallas/riccati.py`), and
bench/missions deploy SUB=16 (2048-lane blocks) while the suite's in-process
tests all run the import default SUB=8 — so the production tile size had
zero parity coverage (ADVICE r4). This runs one whole-step-kernel control
tick at SUB=16 in interpret mode inside a SUBPROCESS (the only way to get a
different import-time SUB) and asserts element-level agreement with the
independent scan backend.
"""

import os
import subprocess
import sys

_SCRIPT = r"""
import os
os.environ["QD_TPU_SUB"] = "16"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from ndp_nmpc_qd_tpu.ops.pallas.riccati import BLOCK, SUB
assert SUB == 16 and BLOCK == 2048, (SUB, BLOCK)

from ndp_nmpc_qd_tpu.models.quadrotor import hover_input, hover_state
from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.solver.rti import make_batched_rti_controller

cfg = NdpNmpcConfig()
N = cfg.ocp.N_node
B = 8  # pads to one 2048-lane block internally
key = jax.random.PRNGKey(3)
pos = jax.random.uniform(key, (B, 3), jnp.float32, -2.0, 2.0)
x0 = hover_state(pos)
xr = jnp.tile(
    hover_state(jnp.zeros((B, 3), jnp.float32))[:, None, :], (1, N + 1, 1)
)
ur = jnp.tile(hover_input(cfg.vehicle, (B,))[:, None, :], (1, N, 1))
f = 0.2 * jax.random.normal(jax.random.PRNGKey(5), (B, N + 1, 3), jnp.float32)

# the same comparison tests/test_packed_state.py makes at SUB=8: the
# ONE-launch whole-step kernel vs the two-kernel packed path — at the
# SHIPPED tile size both sides run 2048-lane blocks in interpret mode
kw = dict(
    qp_iters=4, lqr_start=False, backend="pallas", interpret=True,
    warm_start=True, whole_ipm=True, packed_state=True,
)
ctl_ref = make_batched_rti_controller(
    cfg.ocp, cfg.vehicle, with_disturbance=True, whole_step=False, **kw
)
ctl_k = make_batched_rti_controller(
    cfg.ocp, cfg.vehicle, with_disturbance=True, whole_step=True, **kw
)
u_r, st_r, info_r = ctl_ref.update(ctl_ref.reset(xr, ur), x0, xr, ur, f)
u_k, st_k, info_k = ctl_k.update(ctl_k.reset(xr, ur), x0, xr, ur, f)
np.testing.assert_allclose(
    np.asarray(u_r), np.asarray(u_k), atol=1e-5,
    err_msg="SUB=16 whole-step vs two-kernel packed path",
)
assert np.array_equal(np.asarray(info_r.ok), np.asarray(info_k.ok))
print("SUB16 PARITY OK")
"""


def test_whole_step_parity_at_shipped_sub16():
    env = dict(os.environ)
    env["QD_TPU_SUB"] = "16"
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.join(os.path.dirname(__file__), "..")
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        env=env,
        cwd=root,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "SUB16 PARITY OK" in out.stdout
