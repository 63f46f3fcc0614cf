"""`parallel/batch_step.make_sharded_step`: the bench --sharded path.

Asserts on the virtual 8-device CPU mesh that the shard_mapped flagship
control step equals the unsharded one (scenario axis is embarrassingly
parallel) — so `bench.py`'s multi-device row measures scaling, not a
different program (VERDICT r3 item 7).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ndp_nmpc_qd_tpu.models.quadrotor import hover_input, hover_state
from ndp_nmpc_qd_tpu.parallel.batch_step import (
    data_mesh,
    make_sharded_step,
    measure_sharded_row,
)
from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.solver.rti import make_batched_rti_controller


def test_sharded_step_matches_unsharded():
    cfg = NdpNmpcConfig()
    N = cfg.ocp.N_node
    B = 16
    ctl = make_batched_rti_controller(
        cfg.ocp, cfg.vehicle, with_disturbance=True, backend="jax"
    )
    key = jax.random.PRNGKey(11)
    pos = jax.random.uniform(key, (B, 3), jnp.float64, -1.0, 1.0)
    x0 = hover_state(pos)
    xr = jnp.tile(
        hover_state(jnp.zeros((B, 3), jnp.float64))[:, None], (1, N + 1, 1)
    )
    ur = jnp.tile(
        hover_input(cfg.vehicle, (B,), jnp.float64)[:, None], (1, N, 1)
    )
    f = jnp.zeros((B, N + 1, 3), jnp.float64)

    def step(rti, x0, xr, ur, f):
        return ctl.update(rti, x0, xr, ur, f)

    rti = ctl.reset(xr, ur)
    u_ref, st_ref, info_ref = jax.jit(step)(rti, x0, xr, ur, f)

    mesh = data_mesh()
    assert mesh.devices.size == 8  # conftest virtual mesh
    args0 = (rti, x0, xr, ur, f)
    sfn, place = make_sharded_step(step, mesh, args0)
    rti_s, x0_s, xr_s, ur_s, f_s = place(args0)
    u_s, st_s, info_s = sfn(rti_s, x0_s, xr_s, ur_s, f_s)

    np.testing.assert_allclose(
        np.asarray(u_ref), np.asarray(u_s), rtol=1e-10, atol=1e-10
    )
    np.testing.assert_array_equal(
        np.asarray(info_ref.ok), np.asarray(info_s.ok)
    )
    np.testing.assert_allclose(
        np.asarray(st_ref.x_bar), np.asarray(st_s.x_bar), atol=1e-10
    )
    # state chains: a second sharded tick runs on the sharded outputs
    u_s2, st_s2, _ = sfn(st_s, x0_s, xr_s, ur_s, f_s)
    u_ref2, _, _ = jax.jit(step)(st_ref, x0, xr, ur, f)
    np.testing.assert_allclose(
        np.asarray(u_ref2), np.asarray(u_s2), rtol=1e-9, atol=1e-9
    )


def test_sharded_bench_row_schema_on_virtual_mesh():
    """Multi-chip readiness as a tested contract (VERDICT r4 item 5): the
    EXACT code path `bench.py --sharded` runs — `measure_sharded_row` —
    executes at n_devices=8 on the virtual CPU mesh and emits the artifact
    row schema the first real pod run will produce, so that run needs zero
    new code. Also locks the BLOCK-divisibility guard (ADVICE r4): a
    packed-layout batch that does not split into whole lane blocks per
    device must SKIP with a reason, not crash mid-bench."""
    cfg = NdpNmpcConfig()
    N = cfg.ocp.N_node
    B = 16
    ctl = make_batched_rti_controller(
        cfg.ocp, cfg.vehicle, with_disturbance=True, backend="jax"
    )
    key = jax.random.PRNGKey(5)
    pos = jax.random.uniform(key, (B, 3), jnp.float64, -1.0, 1.0)
    x0 = hover_state(pos)
    xr = jnp.tile(
        hover_state(jnp.zeros((B, 3), jnp.float64))[:, None], (1, N + 1, 1)
    )
    ur = jnp.tile(
        hover_input(cfg.vehicle, (B,), jnp.float64)[:, None], (1, N, 1)
    )
    f = jnp.zeros((B, N + 1, 3), jnp.float64)

    def step(rti, x0, xr, ur, f):
        return ctl.update(rti, x0, xr, ur, f)

    rti = ctl.reset(xr, ur)
    row, skip = measure_sharded_row(
        step, (rti, x0, xr, ur, f), B=B, single_sps=1.0, iters=2
    )
    assert skip is None
    # the schema contract: every field the pod-run consumer reads
    assert set(row) == {
        "n_devices", "B_global", "solves_per_s",
        "solves_per_s_per_device", "scaling_efficiency_vs_single", "ok",
    }
    assert row["n_devices"] == 8  # conftest virtual mesh
    assert row["B_global"] == B
    assert row["ok"] == B  # hover-regime solves all healthy
    assert row["solves_per_s"] > 0
    assert row["solves_per_s_per_device"] > 0
    assert row["scaling_efficiency_vs_single"] > 0

    # guard: packed layout, B not block-divisible per device -> skip+reason
    row_bad, skip_bad = measure_sharded_row(
        step, (rti, x0, xr, ur, f), B=B, single_sps=1.0, iters=1,
        packed_state=True,
    )
    assert row_bad is None and "block" in skip_bad
