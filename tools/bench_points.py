"""Operating-point sweep for the fused control step, in ONE process.

Times the bench.py device step (downwash forecast + linearize + IPM) at
several batch sizes with the bench methodology (chained state, block once),
printing a JSON line per point. One process = one tunnel window; compiles
cache in .jax_cache.

    python tools/bench_points.py [B ...]   (default 4096 8192 16384 32768 65536)

Config mirrors bench.py's deployed defaults (whole-step kernel, packed
state, warm@3, bf16 payload + bf16 MLP, QD_TPU_SUB=16); override with the
same BENCH_* env knobs.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("QD_TPU_SUB", "16")

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from ndp_nmpc_qd_tpu.models.downwash_mlp import load_npz, predict_downwash
from ndp_nmpc_qd_tpu.models.quadrotor import hover_input, hover_state
from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.solver.rti import make_batched_rti_controller


def main():
    Bs = [int(b) for b in sys.argv[1:]] or [4096, 8192, 16384, 32768, 65536]
    cfg = NdpNmpcConfig()
    qp_iters = int(os.environ.get("BENCH_QP_ITERS", "3"))
    whole = os.environ.get("BENCH_WHOLE_IPM", "1") == "1"
    jac_bf16 = os.environ.get("BENCH_JAC_BF16", "1") == "1"
    packed = os.environ.get("BENCH_PACKED_STATE", "1") == "1"
    whole_step = os.environ.get("BENCH_WHOLE_STEP", "1") == "1" and packed
    mlp_bf16 = os.environ.get("BENCH_MLP_BF16", "1") == "1"
    ctl = make_batched_rti_controller(
        cfg.ocp, cfg.vehicle, with_disturbance=True, qp_iters=qp_iters,
        warm_start=True, jac_bf16=jac_bf16, lqr_start=False, whole_ipm=whole,
        packed_state=packed, whole_step=whole_step,
    )
    N = cfg.ocp.N_node
    params = load_npz(
        os.path.join(
            os.path.dirname(__file__), "..", "assets",
            "downwash_analytic_sn4.npz",
        )
    )

    def control_step(rti, x0, xr, ur, other):
        f = predict_downwash(
            params, other, xr, r_horiz=cfg.downwash.r_horiz,
            ego_gate_pos=x0[..., 0:3],
            compute_dtype=jnp.bfloat16 if mlp_bf16 else None,
        )
        return ctl.update(rti, x0, xr, ur, f)

    step = jax.jit(control_step)
    for B in Bs:
        key = jax.random.PRNGKey(0)
        pos = jax.random.uniform(key, (B, 3), jnp.float32, -1.0, 1.0)
        x0 = hover_state(pos)
        xr = jnp.tile(hover_state(jnp.zeros((B, 3)))[:, None, :], (1, N + 1, 1))
        ur = jnp.tile(hover_input(cfg.vehicle, (B,))[:, None, :], (1, N, 1))
        other = xr.at[:, :, 2].add(0.9)
        rti = ctl.reset(xr, ur)
        t0 = time.perf_counter()
        u0, rti, info = step(rti, x0, xr, ur, other)
        jax.block_until_ready(u0)
        compile_s = time.perf_counter() - t0
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            u0, rti, info = step(rti, x0, xr, ur, other)
        jax.block_until_ready(u0)
        mean = (time.perf_counter() - t0) / iters
        print(
            json.dumps(
                {
                    "B": B, "device_step_ms": round(mean * 1e3, 3),
                    "solves_per_s": round(B / mean, 1),
                    "compile_s": round(compile_s, 1),
                    "qp_iters": qp_iters, "whole_ipm": whole,
                    "ok": int(jnp.sum(info.ok)),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
