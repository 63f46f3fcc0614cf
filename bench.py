"""Benchmark: batched NDP-NMPC solves/s on one chip.

Measures the steady-state throughput of the fused control step — downwash-MLP
forecast + horizon linearization + Riccati-IPM QP solve (N=20, nx=10, nu=4),
vmapped over a scenario batch — on the default JAX device (the real TPU under
the driver; CPU if forced).

Baseline: the reference runs ONE acados SQP_RTI solve per 20 ms control
period per device (`nmpc_params.py:11`, budget analysis in BASELINE.md), i.e.
50 solves/s/device. `vs_baseline` = solves_per_s / 50.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import time

# 2048-lane batch blocks for the kernels ((16,128) tiles = two native VPU
# tiles of independent scenarios per elementwise op): the whole-step kernel
# is latency-bound on its sequential stage chains (profiler: ~3x above the
# VPU FLOP estimate at SUB=8), and the wider tiles hide that dependency
# latency — measured 5.9 -> 5.5 ms at B=32768. Must be set before the
# package import (ops/pallas/riccati.py reads it at import time). Tests
# keep the default SUB=8 (interpret cost scales with the block).
# SUB=32 (4096-lane blocks): measured OFF, 2026-08-21 — it compiles and
# runs within the 128 MB VMEM limit, but the queued step is ~6% SLOWER
# than SUB=16 (5.1 vs 4.8 ms at B=32768, warm@3): past two native tiles
# per op the extra issue width stops hiding latency and the doubled
# working set starts costing VMEM locality.
os.environ.setdefault("QD_TPU_SUB", "16")

import jax

# persistent compilation cache: the Pallas Riccati kernels take minutes to
# compile cold but are stable across runs on the same jaxlib/TPU
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp


def main():
    from ndp_nmpc_qd_tpu.models.downwash_mlp import load_npz, predict_downwash
    from ndp_nmpc_qd_tpu.models.quadrotor import hover_input, hover_state
    from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
    from ndp_nmpc_qd_tpu.solver.rti import make_batched_rti_controller

    cfg = NdpNmpcConfig()
    # deployment configuration: QP multipliers warm-started across control
    # ticks (dual warm start) at THREE IPM iterations — adopted round 5
    # (VERDICT r4 item 6) with this margin policy:
    # - accuracy: full-mission max control deviation vs the independent
    #   scan backend is set by the bf16 payload, NOT the iteration count —
    #   measured 2026-08-21 under the complete deployed config (whole-step
    #   kernel + packed state + bf16 + SUB=16): 5.86e-5 single-drone /
    #   5.85e-5 three-drone NDP at warm@3, IDENTICAL to warm@4's floor
    #   (tools/validate_backends.py --whole-step --warm-iters 3); the
    #   f32-payload iteration study is likewise accuracy-flat 6 -> 3
    #   (1.9e-6 @6/@5/@4, 2.8e-5 @3).
    # - robustness: the far-regime envelope holds 100/100 healthy to 100 m
    #   at 3 iterations BOTH warm and cold (tools/qp_envelope.py --iters 3,
    #   max_eq_res 2.6e-5) — the cold case covers first-tick and
    #   post-recovery re-seed solves, which run the same kernel with the
    #   cold sentinel.
    # - backstop: live divergence recovery (recover=True, the respawn
    #   analog) re-seeds any solve that still goes unhealthy; the chaos
    #   tests drill it on every layout.
    # Measured gain: 4.42 ms/step vs 5.24 at warm@4 (B=32768 multi-tick) —
    # 7.42M vs 6.26M solves/s. Below 3 is NOT validated: 2 iterations has
    # no envelope/mission evidence and no margin over the barrier-update
    # schedule; the scan-backend missions (small topologies / CPU) keep
    # cold @ 12 (no dual warm start there).
    qp_iters = int(os.environ.get("BENCH_QP_ITERS", "3"))
    # split-precision stage payload (hq/a/b bf16; bc/gx/gu/r f32 — see
    # `solver/ocp_sparse.py` docstring) is the bench default: validated on
    # the exact whole-IPM path by tools/validate_backends.py
    # --whole-ipm-bf16 at 5.9e-5 full-mission max control deviation
    # (2026-08-20), 17x inside the 1e-3 golden bound, and measured 4.5 ->
    # 4.2 ms at B=16384 (3.64M -> 3.88M solves/s)
    jac_bf16 = os.environ.get("BENCH_JAC_BF16", "1") == "1"
    # whole-solve persistent-VMEM IPM kernel (ops/pallas/ipm_whole.py):
    # the stage payload streams from HBM once per solve instead of once per
    # iteration; implies the zero-control start (the validated
    # equal-accuracy configuration for the warm-started path).
    # Round-4 mission validation of the FULL bench configuration
    # (whole-step kernel + packed state + bf16 payload + warm@4/@3 +
    # QD_TPU_SUB=16, tools/validate_backends.py --whole-step, 2026-08-21):
    # max control deviation vs the independent scan backend 5.85e-5
    # single-drone / 5.86e-5 three-drone NDP over full 500-tick missions —
    # 17x inside the 1e-3 golden bound, RMSE identical to the mm.
    whole_ipm = os.environ.get("BENCH_WHOLE_IPM", "1") == "1"
    lqr_start = (
        os.environ.get("BENCH_LQR_START", "0" if whole_ipm else "1") == "1"
    )
    # kernel-layout-resident RtiState (solver/rti.py packed_state): iterates
    # + carried duals stay in kernel layout across ticks; the whole-IPM
    # kernel folds the SQP axpy and emits updated iterates directly — the
    # pack/rti_glue layout traffic (34% of r3's HBM bytes/solve) disappears
    # (VERDICT r3 item 2). Element parity: tests/test_packed_state.py.
    packed_state = os.environ.get("BENCH_PACKED_STATE", "1") == "1"
    # ONE-kernel control step (ops/pallas/step_whole.py): linearization +
    # whole IPM + SQP axpy in a single Pallas launch — the stage QP payload
    # never exists in HBM (element parity: tests/test_packed_state.py).
    whole_step = (
        os.environ.get("BENCH_WHOLE_STEP", "1") == "1" and packed_state
    )
    # bf16 MXU compute for the downwash forecast (f32 accumulate): the
    # profiler showed the f32 dot_generals at ~0.5 ms/step of the 4.6 ms
    # device step; forecast delta bounded in tests/test_downwash.py
    mlp_bf16 = os.environ.get("BENCH_MLP_BF16", "1") == "1"
    ctl = make_batched_rti_controller(
        cfg.ocp, cfg.vehicle, with_disturbance=True,
        qp_iters=qp_iters, warm_start=True, jac_bf16=jac_bf16,
        lqr_start=lqr_start, whole_ipm=whole_ipm, packed_state=packed_state,
        whole_step=whole_step,
    )
    N = cfg.ocp.N_node
    params = load_npz(
        os.path.join(os.path.dirname(__file__), "assets", "downwash_analytic_sn4.npz")
    )

    # operating point: best measured throughput with the device step well
    # inside the reference's 20 ms control deadline. Sweep at the DEPLOYED
    # round-5 config (whole-step kernel, warm@3, bf16, SUB=16 —
    # tools/bench_points.py + multi-tick bench runs, 2026-08-21):
    # B=4096 -> 1.35 ms/3.04M solves/s, 8192 -> 2.07/3.96M,
    # 16384 -> 3.01/5.44M, 32768 -> 4.45 ms (multi-tick)/7.37M,
    # 65536 -> 8.42 ms/7.79M (OPTIMUM, 2.4x inside the deadline),
    # 131072 -> 17.4 ms/7.52M (tail-off, and only 1.15x inside the
    # deadline — rejected). warm@3 moved the optimum up one size class
    # from round 4's B=32768: the shorter IPM loop leaves more of the
    # per-block time in kernel ramp-up, which the bigger batch amortizes.
    B = int(os.environ.get("BENCH_BATCH", "65536"))
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    pos = jax.random.uniform(k1, (B, 3), jnp.float32, -1.0, 1.0)
    x0 = hover_state(pos)
    xr = jnp.tile(hover_state(jnp.zeros((B, 3)))[:, None, :], (1, N + 1, 1))
    ur = jnp.tile(hover_input(cfg.vehicle, (B,))[:, None, :], (1, N, 1))
    # other-drone horizons hovering above: keeps the MLP forecast active
    other = xr.at[:, :, 2].add(0.9)

    def control_step(rti, x0, xr, ur, other):
        f = predict_downwash(
            params, other, xr, r_horiz=cfg.downwash.r_horiz,
            ego_gate_pos=x0[..., 0:3],
            compute_dtype=jnp.bfloat16 if mlp_bf16 else None,
        )
        return ctl.update(rti, x0, xr, ur, f)

    rti = ctl.reset(xr, ur)
    # donate the carry on the packed-kernel path: the whole-step kernel
    # aliases its state inputs to its outputs (in-place update); without
    # donation the queued-dispatch path would pay a defensive copy of the
    # ~150 MB RtiState every step. Non-kernel layouts must not donate —
    # their reset() state shares the xr/ur argument buffers.
    donate = (0,) if getattr(ctl, "layout", "batch") == "kernel" else ()
    step = jax.jit(control_step, donate_argnums=donate)

    t0 = time.perf_counter()
    u0, rti, info = step(rti, x0, xr, ur, other)
    jax.block_until_ready(u0)
    compile_s = time.perf_counter() - t0

    # throughput: queue a pipeline of dependent steps, block once — measures
    # device time without paying the host dispatch round-trip per step (in
    # deployment consecutive control ticks are queued the same way)
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        u0, rti, info = step(rti, x0, xr, ur, other)
    jax.block_until_ready(u0)
    mean = (time.perf_counter() - t0) / iters
    solves_per_s = B / mean

    # latency diagnostic: per-dispatch blocking (includes host round-trip)
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        u0, rti, info = step(rti, x0, xr, ur, other)
        jax.block_until_ready(u0)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    n_ok = int(jnp.sum(info.ok))

    print(
        f"device={jax.devices()[0]} B={B} compile={compile_s:.1f}s "
        f"device-step {mean*1e3:.1f}ms "
        f"blocking-dispatch p50={lat[len(lat)//2]*1e3:.1f}ms "
        f"p90={lat[-1]*1e3:.1f}ms ok={n_ok}/{B}",
        file=sys.stderr,
    )

    # --- device-limit throughput: K consecutive control ticks scanned in
    # ONE dispatch (VERDICT r4 item 1a). The queued-steps row above still
    # pays the host->device dispatch gap per step (~1.4 ms through the axon
    # tunnel, profiler-attributed: 4.14 ms device vs 5.5 ms wall in r4);
    # deployment's episode path (sim/closed_loop.py) runs its whole mission
    # in-graph, so the honest device-limit number is the same flagship step
    # scanned K deep — one dispatch amortizes the gap to nothing. Per-tick
    # inputs drift with the tick index (plant-motion scale) so every tick's
    # MLP forecast + linearization stays live in the graph: with
    # tick-invariant inputs XLA would hoist that work out of the scan. ---
    multitick_row = None
    if os.environ.get("BENCH_MULTITICK", "1") == "1":
        from jax import lax

        # K sweep at B=65536/warm@3 with the in-place-aliased kernel state
        # (2026-08-21): K=32 -> 7.43 ms/step, K=64 -> 7.35 (twice),
        # K=128 -> 7.31 (asymptote ~7.3 = the pure device step; the
        # remaining wall-vs-op-sum gap is inter-op scheduling bubbles the
        # op trace doesn't attribute). K=64 is the default: within 0.5% of
        # the asymptote with a ~0.47 s dispatch window; deployment's
        # episode path scans the whole mission anyway.
        K = int(os.environ.get("BENCH_MULTITICK_K", "64"))

        # The per-tick drift is a broadcast-add of a one-hot z column, NOT
        # an .at[].add scatter: scattering into the loop-invariant tensors
        # lowers to copy(55 MB) + scatter-add every tick (~0.29 ms/tick of
        # pure harness artifact at B=65536, profiler-measured), while the
        # broadcast-add fuses into the MLP input computation.
        ez_x = jnp.zeros((1, 10), x0.dtype).at[0, 2].set(1.0)
        ez_o = jnp.zeros((1, 1, 10), x0.dtype).at[0, 0, 2].set(1.0)

        def k_ticks(rti, x0, xr, ur, other):
            def body(carry, k):
                rti = carry
                kf = k.astype(x0.dtype)
                x0k = x0 + (0.002 * kf) * ez_x
                otherk = other + (0.001 * kf) * ez_o
                u0, rti, info = control_step(rti, x0k, xr, ur, otherk)
                return rti, info.ok
            rti, oks = lax.scan(
                body, rti, jnp.arange(K, dtype=jnp.int32)
            )
            return rti, oks

        mt = jax.jit(k_ticks, donate_argnums=donate)
        # the scan donates its carry; hand it a copy so `rti` stays alive
        # for the sharded row below (donated buffers are deleted)
        rti_m = jax.tree_util.tree_map(jnp.copy, rti)
        t0 = time.perf_counter()
        rti_m, oks_m = mt(rti_m, x0, xr, ur, other)
        jax.block_until_ready(oks_m)
        mt_compile = time.perf_counter() - t0
        reps = int(os.environ.get("BENCH_MULTITICK_REPS", "4"))
        t0 = time.perf_counter()
        for _ in range(reps):
            rti_m, oks_m = mt(rti_m, x0, xr, ur, other)
        jax.block_until_ready(oks_m)
        per_step_mt = (time.perf_counter() - t0) / (reps * K)
        sps_mt = B / per_step_mt
        multitick_row = {
            "B": B, "K_ticks_per_dispatch": K,
            "device_step_ms": round(per_step_mt * 1e3, 3),
            "solves_per_s": round(sps_mt, 1),
            "compile_s": round(mt_compile, 1),
            "ok_last_tick": int(jnp.sum(oks_m[-1])),
            "note": "same flagship step as 'throughput', scanned K deep "
            "in-graph (the episode deployment pattern) — no per-step "
            "dispatch gap",
        }
        print(
            f"multi-tick (K={K}/dispatch): {per_step_mt*1e3:.2f} ms/step "
            f"-> {sps_mt:.0f} solves/s "
            f"(ok={int(jnp.sum(oks_m[-1]))}/{B})",
            file=sys.stderr,
        )

    # --- multi-device scaling (VERDICT r3 item 7): the SAME flagship step
    # shard_mapped over ALL local devices along the scenario axis
    # (parallel/batch_step.py). One chip degenerates to the number above;
    # on a pod this measures solves/s/chip scaling with zero new code. ---
    sharded_row = None
    if os.environ.get("BENCH_SHARDED", "1") == "1":
        from ndp_nmpc_qd_tpu.parallel.batch_step import measure_sharded_row

        sharded_row, skip = measure_sharded_row(
            control_step, (rti, x0, xr, ur, other),
            B=B, single_sps=solves_per_s, iters=iters,
            packed_state=packed_state,
        )
        if sharded_row is not None:
            nd = sharded_row["n_devices"]
            print(
                f"sharded over {nd} device(s): "
                f"{sharded_row['solves_per_s']:.0f} solves/s "
                f"({sharded_row['solves_per_s_per_device']:.0f}/device, "
                f"eff={sharded_row['scaling_efficiency_vs_single']:.2f} "
                f"vs single)",
                file=sys.stderr,
            )
        else:
            print(f"sharded: skipped ({skip})", file=sys.stderr)

    # --- interactive (ControllerDaemon-shaped) tick: ONE blocking dispatch
    # per 20 ms control period, state chained tick to tick (VERDICT r1 item
    # 3). B=1 is the per-drone daemon program (scan backend, like
    # runtime/nodes.py); B=64 a small co-hosted fleet. p50/p99 vs the 20 ms
    # deadline (`nmpc_node.py:216-220`); details also land in
    # BENCH_DETAILS.json. ---
    # --- roofline: judge the number against the chip, not against the
    # reference's 50 solves/s (VERDICT r2 item 2). Bytes/flops are computed
    # analytically from the kernel layouts (utils/roofline.py). ---
    from ndp_nmpc_qd_tpu.utils.roofline import roofline_report, step_cost

    cost = step_cost(
        N=N, qp_iters=qp_iters, jac_bf16=jac_bf16,
        whole_kernel=whole_ipm, lqr_start=lqr_start,
        packed_state=packed_state, whole_step=whole_step,
    )
    roof = roofline_report(cost, solves_per_s)
    print(
        f"roofline: {roof['hbm_bytes_per_solve']/1e3:.1f} KB/solve -> "
        f"{roof['achieved_gb_s']} GB/s = {roof['hbm_roofline_pct']}% of "
        f"v5e HBM peak; ~{roof['achieved_tflops_est']} TFLOP/s VPU est.",
        file=sys.stderr,
    )

    details = {"throughput": {
        "B": B, "device_step_ms": round(mean * 1e3, 3),
        "solves_per_s": round(solves_per_s, 1),
        "compile_s": round(compile_s, 1),
        "blocking_p50_ms": round(lat[len(lat) // 2] * 1e3, 2),
        "qp_iters": qp_iters, "whole_ipm": whole_ipm,
        "jac_bf16": jac_bf16, "lqr_start": lqr_start,
        "packed_state": packed_state, "whole_step": whole_step,
        "mlp_bf16": mlp_bf16,
        "sub_lanes": int(os.environ.get("QD_TPU_SUB", "8")),
        "roofline": roof,
    }}
    if multitick_row is not None:
        details["throughput_multitick"] = multitick_row
    if sharded_row is not None:
        details["sharded"] = sharded_row
    if os.environ.get("BENCH_INTERACTIVE", "1") == "1":
        import gc

        from ndp_nmpc_qd_tpu.solver.rti import make_rti_controller

        # the interactive rows model the ControllerDaemon tick, which runs
        # with the cyclic GC disabled (runtime/nodes.py real-time GC policy:
        # per-tick garbage is acyclic; automatic collection caused multi-ms
        # p99 outliers). Measure under the same policy; restore it even if a
        # section raises (ADVICE r3).
        gc_was_enabled = gc.isenabled()
        gc.collect()
        gc.disable()

        def prov(samples):
            # per-row measurement provenance (ADVICE r3: merged
            # BENCH_DETAILS rows must say how they were measured)
            return {"samples": samples, "gc_disabled": True,
                    "device": str(jax.devices()[0].platform)}

        def measure_rows(tag, ctl_i, x0_i, xr_i, ur_i, f_i, backend_label,
                         Bi, cfg_label):
            """Blocking + pipelined tick rows for one controller config.
            Every row names the backend/config it measured (VERDICT r4
            item 2: the device-only rows used to measure the scan backend
            without saying so)."""
            st_i = ctl_i.reset(xr_i, ur_i)
            don_i = (
                (0,)
                if getattr(ctl_i, "layout", "batch") == "kernel"
                else ()
            )  # scan-backend reset() shares xr/ur buffers: no donate
            step_i = jax.jit(ctl_i.update, donate_argnums=don_i)
            for _ in range(10):
                u_i, st_i, _ = step_i(st_i, x0_i, xr_i, ur_i, f_i)
            jax.block_until_ready(u_i)
            lbl = {"backend": backend_label, "config": cfg_label}
            ticks = []
            for _ in range(200):
                t0 = time.perf_counter()
                u_i, st_i, _ = step_i(st_i, x0_i, xr_i, ur_i, f_i)
                jax.block_until_ready(u_i)
                ticks.append(time.perf_counter() - t0)
            ticks.sort()
            p50 = ticks[len(ticks) // 2] * 1e3
            p99 = ticks[int(len(ticks) * 0.99)] * 1e3
            details[tag] = {
                "p50_ms": round(p50, 2), "p99_ms": round(p99, 2),
                "deadline_ms": 20.0, "meets_deadline_p99": p99 < 20.0,
                **lbl, **prov(200),
            }
            print(
                f"interactive {tag}: blocking tick p50={p50:.2f}ms "
                f"p99={p99:.2f}ms (20 ms budget, {backend_label})",
                file=sys.stderr,
            )

            # dispatch-ahead pipelining (the daemon's default on accelerator
            # devices, runtime/nodes.py): enqueue tick k, block on tick k-1
            # — one-tick-stale output, the reference's own asynchrony class
            # (`nmpc_node.py:160-162`). The tick cadence then hides the
            # host<->device round-trip instead of paying it per tick.
            prev = None
            ticks = []
            for _ in range(200):
                t0 = time.perf_counter()
                u_i, st_i, _ = step_i(st_i, x0_i, xr_i, ur_i, f_i)
                if prev is not None:
                    jax.block_until_ready(prev)
                prev = u_i
                ticks.append(time.perf_counter() - t0)
            jax.block_until_ready(prev)
            ticks.sort()
            p50 = ticks[len(ticks) // 2] * 1e3
            p99 = ticks[int(len(ticks) * 0.99)] * 1e3
            details[f"{tag}_pipelined"] = {
                "p50_ms": round(p50, 2), "p99_ms": round(p99, 2),
                "deadline_ms": 20.0, "meets_deadline_p99": p99 < 20.0,
                "staleness_ticks": 1, **lbl, **prov(200),
            }
            print(
                f"interactive {tag} pipelined: tick p50={p50:.2f}ms "
                f"p99={p99:.2f}ms (20 ms budget, 1-tick stale)",
                file=sys.stderr,
            )

        try:
            for Bi in (1, 64):
                if Bi == 1:
                    ctl_i = make_rti_controller(
                        cfg.ocp, cfg.vehicle, with_disturbance=True
                    )
                    x0_i, xr_i, ur_i = x0[0], xr[0], ur[0]
                    f_i = jnp.zeros((N + 1, 3))
                else:
                    ctl_i = make_batched_rti_controller(
                        cfg.ocp, cfg.vehicle, with_disturbance=True,
                        backend="jax",
                    )
                    x0_i, xr_i, ur_i = x0[:Bi], xr[:Bi], ur[:Bi]
                    f_i = jnp.zeros((Bi, N + 1, 3))
                measure_rows(
                    f"interactive_B{Bi}", ctl_i, x0_i, xr_i, ur_i, f_i,
                    "jax_scan", Bi,
                    "cold@12 scan solver (the CPU-daemon program)",
                )

                # the DEPLOYED accelerator kernel at daemon shapes
                # (VERDICT r4 item 2): B pads to ONE SUB*128-lane block, so
                # a small fleet pays one grid step of the whole-step kernel
                # instead of the scan backend's serial sweep chain
                if os.environ.get("BENCH_INTERACTIVE_PACKED", "1") == "1":
                    ctl_p = make_batched_rti_controller(
                        cfg.ocp, cfg.vehicle, with_disturbance=True,
                        qp_iters=qp_iters, warm_start=True,
                        jac_bf16=jac_bf16, lqr_start=lqr_start,
                        whole_ipm=whole_ipm, packed_state=packed_state,
                        whole_step=whole_step,
                    )
                    xb = max(Bi, 1)
                    measure_rows(
                        f"interactive_B{Bi}_packed", ctl_p,
                        x0[:xb], xr[:xb], ur[:xb],
                        jnp.zeros((xb, N + 1, 3)), "pallas_whole_step", Bi,
                        f"the bench/mission kernel config (warm@{qp_iters}, "
                        f"bf16={jac_bf16}, one {int(os.environ.get('QD_TPU_SUB', '8')) * 128}-lane block)",
                    )

            # --- the deployed default: CPU-pinned daemon tick (cli.py serves
            # daemons on CPU unless --device tpu). Same B=1 scan-backend program
            # as runtime/nodes.py, measured on the in-process CPU device. ---
            try:
                cpu = jax.devices("cpu")[0]
            except RuntimeError:
                cpu = None
            if cpu is not None:
                with jax.default_device(cpu):
                    ctl_c = make_rti_controller(
                        cfg.ocp, cfg.vehicle, with_disturbance=True
                    )
                    x0_c = jax.device_put(x0[0], cpu)
                    xr_c = jax.device_put(xr[0], cpu)
                    ur_c = jax.device_put(ur[0], cpu)
                    f_c = jax.device_put(jnp.zeros((N + 1, 3)), cpu)
                    st_c = ctl_c.reset(xr_c, ur_c)
                    don_c = (
                        (0,)
                        if getattr(ctl_c, "layout", "batch") == "kernel"
                        else ()
                    )
                    step_c = jax.jit(ctl_c.update, donate_argnums=don_c)
                    # 50 warmup ticks: the first dispatches after compile pay
                    # one-off allocator/runtime warm costs that a long-running
                    # daemon never sees again
                    for _ in range(50):
                        u_c, st_c, _ = step_c(st_c, x0_c, xr_c, ur_c, f_c)
                    jax.block_until_ready(u_c)
                    ticks = []
                    for _ in range(1000):
                        t0 = time.perf_counter()
                        u_c, st_c, _ = step_c(st_c, x0_c, xr_c, ur_c, f_c)
                        jax.block_until_ready(u_c)
                        ticks.append(time.perf_counter() - t0)
                ticks.sort()
                p50 = ticks[len(ticks) // 2] * 1e3
                p99 = ticks[int(len(ticks) * 0.99)] * 1e3
                details["cpu_daemon_tick"] = {
                    "p50_ms": round(p50, 2), "p99_ms": round(p99, 2),
                    "deadline_ms": 20.0, "meets_deadline_p99": p99 < 20.0,
                    **{**prov(1000), "device": "cpu"},
                }
                print(
                    f"cpu daemon tick: p50={p50:.2f}ms p99={p99:.2f}ms "
                    f"(20 ms budget)",
                    file=sys.stderr,
                )
        finally:
            if gc_was_enabled:
                gc.enable()
    # merge-update the details artifact: a BENCH_INTERACTIVE=0 run must not
    # drop the interactive rows captured by a previous full run
    details_path = os.path.join(os.path.dirname(__file__), "BENCH_DETAILS.json")
    try:
        with open(details_path) as f:
            merged = json.load(f)
    except (OSError, ValueError):
        merged = {}
    merged.update(details)
    with open(details_path, "w") as f:
        json.dump(merged, f, indent=1)

    # headline = the better of the two measurement modes; deployment runs
    # missions in-graph (the multi-tick pattern), so when that row exists it
    # is the honest steady-state number — the queued row additionally pays
    # the per-step dispatch gap of this environment's remote-TPU tunnel
    best_sps, best_src = solves_per_s, "queued_dispatches"
    if multitick_row is not None and multitick_row["solves_per_s"] > best_sps:
        best_sps = multitick_row["solves_per_s"]
        best_src = "multitick_scan"
    merged["headline"] = {
        "solves_per_s": round(best_sps, 1), "metric_source": best_src,
    }
    with open(details_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(
        json.dumps(
            {
                "metric": "ndp_nmpc_solves_per_s_chip",
                "value": round(best_sps, 1),
                "unit": "solves/s",
                "vs_baseline": round(best_sps / 50.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
