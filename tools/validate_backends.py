"""Closed-loop cross-backend validation: the BASELINE deviation metric.

BASELINE.json's acceptance is "max control deviation < 1e-3 vs the acados
control sequence" on the flight trajectories. acados cannot run in this
environment, so the strongest equivalent is a full-mission comparison
between this framework's two INDEPENDENT solver implementations:

- scan backend: jnp Riccati scans + vmapped IPM (f32-precision-pinned XLA)
- pallas backend: packed batch-on-lanes kernels + packed IPM

Same episode, same dtype, same ticks; reports the max absolute control
deviation and the trajectory divergence over the whole figure-eight mission.
Run on TPU (the pallas path); takes a few minutes of compiles.

  python tools/validate_backends.py [--ticks 500]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=500)
    ap.add_argument("--hold-ticks", type=int, default=100)
    ap.add_argument(
        "--warm-iters", type=int, default=0,
        help="also validate the warm-start pallas path at this qp_iters "
        "(0 = skip); deviation is reported vs the scan backend",
    )
    ap.add_argument(
        "--no-lqr-start", action="store_true",
        help="also validate the warm path with the zero-control-rollout "
        "start instead of the clipped-LQR start (saves a backward sweep)",
    )
    ap.add_argument(
        "--bf16", action="store_true",
        help="also validate the bf16-Jacobian warm path",
    )
    ap.add_argument(
        "--whole-ipm", action="store_true",
        help="also validate the whole-solve persistent-VMEM IPM kernel "
        "(ops/pallas/ipm_whole.py; implies the zero-control start)",
    )
    ap.add_argument(
        "--whole-ipm-bf16", action="store_true",
        help="whole-solve kernel with the split-precision bf16 payload",
    )
    ap.add_argument(
        "--whole-step", action="store_true",
        help="also validate the ONE-kernel control step (linearize + IPM + "
        "axpy fused, kernel-layout-resident state + bf16 payload — the "
        "bench configuration, ops/pallas/step_whole.py)",
    )
    ap.add_argument(
        "--drones", type=int, default=1,
        help="3 = the three_qd_ndp topology (leader NDP forecast + "
        "followers + plant downwash coupling); deviations cover ALL drones",
    )
    args = ap.parse_args()

    from ndp_nmpc_qd_tpu.cli import build_eight
    from ndp_nmpc_qd_tpu.models.downwash_mlp import load_npz
    from ndp_nmpc_qd_tpu.params import NdpNmpcConfig, SimParams
    from ndp_nmpc_qd_tpu.sim.closed_loop import make_episode

    cfg = NdpNmpcConfig(sim=SimParams(k_throttle_true=50.0))
    traj = build_eight()
    ndp_kw = {}
    if args.drones > 1:
        ndp_kw = dict(
            n_drones=args.drones, use_ndp=True, true_downwash=True,
            downwash_params=load_npz(
                os.path.join(
                    os.path.dirname(__file__), "..", "assets",
                    "downwash_analytic_sn4.npz",
                )
            ),
        )

    variants = [("jax", {}), ("pallas", {})]
    if args.warm_iters > 0:
        variants.append(
            (
                "pallas_warm",
                {"solver_warm_start": True, "qp_iters": args.warm_iters},
            )
        )
    if args.no_lqr_start:
        variants.append(
            (
                "pallas_warm_nolqr",
                {
                    "solver_warm_start": True,
                    "qp_iters": args.warm_iters or 6,
                    "solver_lqr_start": False,
                },
            )
        )
    if args.bf16:
        variants.append(
            (
                "pallas_warm_bf16",
                {
                    "solver_warm_start": True,
                    "qp_iters": args.warm_iters or 6,
                    "solver_jac_bf16": True,
                },
            )
        )
    if args.whole_ipm:
        variants.append(
            (
                "pallas_whole",
                {
                    "solver_warm_start": True,
                    "qp_iters": args.warm_iters or 6,
                    "solver_whole_ipm": True,
                },
            )
        )
    if args.whole_ipm_bf16:
        variants.append(
            (
                "pallas_whole_bf16",
                {
                    "solver_warm_start": True,
                    "qp_iters": args.warm_iters or 6,
                    "solver_whole_ipm": True,
                    "solver_jac_bf16": True,
                },
            )
        )
    if args.whole_step:
        variants.append(
            (
                "whole_step_bf16",
                {
                    "solver_warm_start": True,
                    "qp_iters": args.warm_iters or 4,
                    "solver_jac_bf16": True,
                    "solver_packed_state": True,
                    "solver_whole_step": True,
                },
            )
        )
    traces = {}
    for backend, extra in variants:
        init_fn, _, run_fn = make_episode(
            cfg, traj, hold_ticks=args.hold_ticks,
            record_traces=True,
            solver_backend="jax" if backend == "jax" else "pallas",
            **{"n_drones": 1, **ndp_kw, **extra},
        )
        st = init_fn(dtype=jnp.float32)
        st, metrics, (xs, u0s, th) = jax.jit(
            lambda s: run_fn(s, args.ticks)
        )(st)
        jax.block_until_ready(u0s)
        traces[backend] = (np.asarray(xs), np.asarray(u0s), metrics)
        print(
            f"{backend:7s}: pos_rmse {float(metrics.pos_rmse[0]):.5f} "
            f"ok={bool(metrics.ok[0])}", file=sys.stderr,
        )

    import json

    xs_j, u_j, _ = traces["jax"]
    out = {"ticks": args.ticks, "drones": args.drones, "tolerance": 1e-3}
    for name in [n for n, _ in variants if n != "jax"]:
        xs_p, u_p, _ = traces[name]
        du = np.abs(u_j - u_p)
        dpos = np.linalg.norm(
            xs_j[..., 0:3] - xs_p[..., 0:3], axis=-1
        )
        out[name] = {
            "max_control_deviation": float(du.max()),
            "mean_control_deviation": float(du.mean()),
            "max_traj_divergence_m": float(dpos.max()),
            "final_traj_divergence_m": float(np.max(dpos[-1])),
            "pass": bool(du.max() < 1e-3),
        }
    out["pass"] = all(v["pass"] for k, v in out.items() if isinstance(v, dict))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
