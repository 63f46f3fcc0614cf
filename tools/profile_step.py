"""Marginal-cost profiler for the fused control step on the real chip.

Measures device-step time at several qp_iters values (same compiled family,
chained dependent steps, block once) to extract the per-IPM-iteration
marginal — the number the IPM-glue-fusion work (ROADMAP candidate 1) moves.
Also times the two Pallas kernels in isolation at the same batch so the
glue share = marginal - kernels.

Usage: python tools/profile_step.py [B]
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


def timeit(fn, carry, iters=30):
    """Times `carry = fn(carry)` chained — dependent dispatches, so the axon
    tunnel can neither dedup identical calls nor hide device time."""
    carry = fn(carry)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = fn(carry)
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / iters


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

    # chain K control steps INSIDE one jit (lax.scan) and difference two K
    # values: the axon tunnel's dispatch overhead and dedup cannot touch
    # device time measured this way (see ROADMAP operational notes)
    def chained_time(ctl, k):
        rti = ctl.reset(xr, ur)

        def body(carry, _):
            rti, x = carry
            u0, rti, info = ctl.update(rti, x, xr, ur, f)
            # feed u0 back into x0 so no step can be folded away
            x = x.at[:, 3:6].add(1e-9 * u0[:, 0:3])
            return (rti, x), ()

        run = jax.jit(
            lambda rti, x: jax.lax.scan(body, (rti, x), None, length=k)[0]
        )
        return timeit(lambda c: run(*c), (rti, x0), iters=10) / k

    results = {}
    for iters in (0, 6, 12):
        ctl = make_batched_rti_controller(
            cfg.ocp, cfg.vehicle, with_disturbance=True,
            qp_iters=iters, warm_start=True,
        )
        t = chained_time(ctl, 8)
        results[iters] = t
        print(f"qp_iters={iters:2d}: {t*1e3:.3f} ms/step", file=sys.stderr)

    for iters, lqr in ((6, False), (4, True), (4, False)):
        ctl = make_batched_rti_controller(
            cfg.ocp, cfg.vehicle, with_disturbance=True,
            qp_iters=iters, warm_start=True, lqr_start=lqr,
        )
        t = chained_time(ctl, 8)
        print(
            f"qp_iters={iters:2d} lqr_start={lqr}: {t*1e3:.3f} ms/step",
            file=sys.stderr,
        )

    per_iter = (results[12] - results[6]) / 6.0
    base = results[6] - 6 * per_iter
    print(
        f"per-IPM-iteration marginal: {per_iter*1e6:.1f} us  "
        f"(extrapolated 0-iter base {base*1e3:.3f} ms, "
        f"measured 0-iter {results[0]*1e3:.3f} ms)",
        file=sys.stderr,
    )

    # --- kernel-only marginal: chained raw backward+forward sweeps, no IPM
    # glue — the difference vs the IPM marginal above is the glue share ---
    from ndp_nmpc_qd_tpu.ops.pallas.riccati import BLOCK, pack
    from ndp_nmpc_qd_tpu.solver.ocp_sparse import make_linearizer_pallas
    from ndp_nmpc_qd_tpu.ops.pallas.riccati_sparse import riccati_sweep_sparse
    import functools

    lin, consts, _ = make_linearizer_pallas(cfg.ocp, cfg.vehicle, True)
    qp, dx0_p = lin(
        jnp.tile(x0[:, None], (1, N + 1, 1)), ur, xr, ur,
        jnp.zeros((B, N + 1, 3)), x0,
    )
    sweep = functools.partial(
        riccati_sweep_sparse,
        h=consts.h, diag6_stage=consts.diag6_stage,
        diag6_term=consts.diag6_term, rdiag_stage=consts.rdiag_stage,
    )
    tail = qp.gx.shape[2:]
    zeros_su = jnp.zeros((N, 4) + tail, qp.gx.dtype)
    zeros_s3 = jnp.zeros((N + 1, 3) + tail, qp.gx.dtype)

    def sweep_body(carry, _):
        zx, zu = carry
        dx, du, rhat = sweep(
            qp.hq, qp.gx, qp.gu, qp.a, qp.b, qp.r,
            zx, zu, zeros_su, zeros_s3, zeros_su, zeros_s3, dx0_p,
        )
        return (zx + 1e-9 * dx, zu + 1e-9 * du), ()

    for k in (8,):
        zx0 = jnp.zeros((N + 1, 10) + tail, qp.gx.dtype)
        zu0 = jnp.zeros((N, 4) + tail, qp.gx.dtype)
        run = jax.jit(
            lambda c: jax.lax.scan(sweep_body, c, None, length=k)[0]
        )
        t = timeit(lambda c: run(c), (zx0, zu0), iters=10) / k
        print(f"raw sweep (bwd+fwd) marginal: {t*1e6:.1f} us", file=sys.stderr)

    # linearization kernel alone, chained
    def lin_body(carry, _):
        xb, ub = carry
        qp_, d_ = lin(xb, ub, xr, ur, jnp.zeros((B, N + 1, 3)), x0)
        return (xb + 1e-9 * qp_.r.sum() , ub), ()

    xb0 = jnp.tile(x0[:, None], (1, N + 1, 1))
    runl = jax.jit(lambda c: jax.lax.scan(lin_body, c, None, length=8)[0])
    t = timeit(lambda c: runl(c), (xb0, ur), iters=10) / 8
    print(f"linearization kernel marginal: {t*1e6:.1f} us", file=sys.stderr)


if __name__ == "__main__":
    main()
