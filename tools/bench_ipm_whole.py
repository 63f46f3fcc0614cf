"""TPU micro-bench: whole-solve IPM kernel vs the per-iteration kernels.

Builds one linearized QP batch and times `ipm_sparse` with
whole_kernel=False/True (both zero-control start, warm duals carried),
checking element agreement on the way. Run on the real chip:

    python tools/bench_ipm_whole.py [B] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from ndp_nmpc_qd_tpu.models.quadrotor import hover_input, hover_state
from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.solver.ocp_sparse import make_linearizer_pallas
from ndp_nmpc_qd_tpu.solver.qp_ipm_sparse import IpmWarm, ipm_sparse


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    cfg = NdpNmpcConfig()
    N = cfg.ocp.N_node
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    pos = jax.random.uniform(k1, (B, 3), jnp.float32, -3.0, 3.0)
    x0 = hover_state(pos)
    xr = jnp.tile(
        hover_state(jnp.zeros((B, 3), jnp.float32))[:, None, :], (1, N + 1, 1)
    )
    xb = xr.at[:, :, 6:10].add(
        0.1 * jax.random.normal(k2, (B, N + 1, 4), jnp.float32)
    )
    ur = jnp.tile(hover_input(cfg.vehicle, (B,))[:, None, :], (1, N, 1))
    f = 0.3 * jax.random.normal(k3, (B, N + 1, 3), jnp.float32)
    lin, consts, _ = make_linearizer_pallas(cfg.ocp, cfg.vehicle, True)
    qp, dx0_p = jax.jit(lin)(xb, ur, xr, ur, f, x0)
    qp = jax.block_until_ready(qp)
    tail = qp.gx.shape[2:]
    cold = IpmWarm(
        lu_lo=jnp.zeros((N, 4) + tail), lu_up=jnp.zeros((N, 4) + tail),
        lx_lo=jnp.zeros((N + 1, 3) + tail),
        lx_up=jnp.zeros((N + 1, 3) + tail),
        mu=jnp.full(tail, -1.0),
    )

    results = {}
    reps = 20
    for whole in (False, True):
        name = "whole" if whole else "per-iter"
        run = jax.jit(
            lambda q, d, w: ipm_sparse(
                q, consts, d, num_iters=iters, warm=w,
                lqr_start=False, whole_kernel=whole,
            )
        )

        # steady-state marginal measured INSIDE one jit with the warm state
        # chained solve-to-solve — the axon tunnel dedupes identical
        # unchained dispatches and adds ~ms/dispatch (see ROADMAP notes).
        # The timed call gets a salted dx0 so it cannot be a byte-identical
        # replay of the warmup call (tunnel-level dedup again).
        @jax.jit
        def chained(q, d, w):
            def body(wc, _):
                zx, zu, mu, eq, w2 = ipm_sparse(
                    q, consts, d, num_iters=iters, warm=wc,
                    lqr_start=False, whole_kernel=whole,
                )
                return w2, zu[0, 0, 0, 0, 0]

            w2, ys = jax.lax.scan(body, w, None, length=reps)
            return w2, ys

        t0 = time.perf_counter()
        out = jax.block_until_ready(run(qp, dx0_p, cold))
        compile_s = time.perf_counter() - t0
        warm = out[4]
        _, ys0 = chained(qp, dx0_p, warm)  # compile + warm cache
        np.asarray(ys0)
        salted = dx0_p + 1e-6
        t0 = time.perf_counter()
        _, ys = chained(qp, salted, warm)
        ys = np.asarray(ys)  # actual data retrieval = the only hard barrier
        dt = (time.perf_counter() - t0) / reps
        assert not np.allclose(ys, np.asarray(ys0)), "dedup suspected"
        results[name] = (out, dt, compile_s)
        print(
            f"{name:9s} B={B} iters={iters} compile={compile_s:.1f}s "
            f"steady={dt*1e3:.3f} ms  ({B/dt/1e6:.2f}M solves/s IPM-only)",
            flush=True,
        )

    (zx_a, zu_a, mu_a, eq_a, w_a), _, _ = results["per-iter"]
    (zx_b, zu_b, mu_b, eq_b, w_b), _, _ = results["whole"]
    for nm, a, b in (
        ("zu", zu_a, zu_b), ("zx", zx_a, zx_b), ("mu", mu_a, mu_b),
        ("eq", eq_a, eq_b),
    ):
        d = float(jnp.max(jnp.abs(a - b)))
        print(f"max |d{nm}| = {d:.3e}")
    speedup = results["per-iter"][1] / results["whole"][1]
    print(f"speedup (IPM only): {speedup:.2f}x")


if __name__ == "__main__":
    main()
