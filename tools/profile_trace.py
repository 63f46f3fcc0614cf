"""Op-level TPU profile of the fused control step: writes an xplane trace of
a few chained steps and prints the per-op device-time breakdown.

Usage: python tools/profile_trace.py [B]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp


def main():
    from ndp_nmpc_qd_tpu.models.quadrotor import hover_input, hover_state
    from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
    from ndp_nmpc_qd_tpu.solver.rti import make_batched_rti_controller

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    cfg = NdpNmpcConfig()
    N = cfg.ocp.N_node
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (B, 3), jnp.float32, -1.0, 1.0)
    x0 = hover_state(pos)
    xr = jnp.tile(hover_state(jnp.zeros((B, 3)))[:, None, :], (1, N + 1, 1))
    ur = jnp.tile(hover_input(cfg.vehicle, (B,))[:, None, :], (1, N, 1))
    f = jnp.zeros((B, N + 1, 3))

    ctl = make_batched_rti_controller(
        cfg.ocp, cfg.vehicle, with_disturbance=True,
        qp_iters=6, warm_start=True,
    )
    rti = ctl.reset(xr, ur)
    step = jax.jit(ctl.update)
    u0, rti, info = step(rti, x0, xr, ur, f)
    jax.block_until_ready(u0)

    tdir = "/tmp/nmpc_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        r = rti
        for _ in range(5):
            u0, r, info = step(r, x0, xr, ur, f)
        jax.block_until_ready(u0)

    # parse the xplane protobuf: sum durations per (XLA op category / name)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xs = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xs, file=sys.stderr)
    data, _ = rtd.xspace_to_tool_data(xs, "framework_op_stats", {})
    out = os.path.join(os.path.dirname(__file__), "..", ".profile_opstats.csv")
    with open(out, "wb") as fh:
        fh.write(data if isinstance(data, bytes) else data.encode())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
